package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.GraftFunctions

/** Library entry points for users.
  *
  * [[GraftExtensions]] plugs the custom functions into any session via the
  * standard extension mechanism
  * (`spark.sql.extensions=graft.GraftExtensions`), so pure-SQL users get
  * `graft_cosine` / `graft_dot` / `graft_topk` without touching Scala.
  * [[GraftSession]] builds a session with the configuration this engine is
  * designed around.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injectable.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.IntersectCountRewrite)
  }
}

object GraftSession {

  /** Recommended session for this engine. `shufflePartitions` should track
    * the executor-core budget (32 locally; hundreds-to-thousands on a real
    * cluster — AQE coalesces the excess at runtime).
    */
  def builder(master: String = "local[32]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)

  def getOrCreate(master: String = "local[32]",
                  shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** Object-store (s3a://) configuration for a real deployment — the
    * reference is S3-first end to end (`flink-s3-fs-hadoop` at the
    * reference `pom.xml:40-44`, `s3://` URIs in all three jobs); Spark
    * reads the same buckets through the identical Hadoop FileSystem
    * abstraction, so every reader/sink in [[graft.sources.Tables]] takes
    * an `s3a://bucket/key` path unchanged.
    *
    * Exposed as a plain map so it can feed either `.config(...)` calls or
    * `spark-submit --conf` lines. Needs `hadoop-aws` (+ bundled AWS SDK)
    * and `spark-hadoop-cloud` on the cluster classpath — not shipped in
    * this offline build, which is also why there is no integration test.
    * Credentials are deliberately ABSENT: the default s3a provider chain
    * (env vars, instance profile, sso) is the supported path; never bake
    * keys into session conf.
    *
    *  - magic committer: task commits become S3 multipart-upload
    *    completions — no rename-based commit (S3 has no atomic rename),
    *    which is the batch equivalent of the reference sink's
    *    in-progress → finished part lifecycle.
    *  - upload tuning: parallel multipart upload buffered to disk, 64 MB
    *    parts, 128 MB target split size for downstream scans.
    */
  def s3aConfigs(committer: String = "magic"): Map[String, String] = Map(
    "spark.hadoop.fs.s3a.committer.name" -> committer,
    "spark.hadoop.fs.s3a.committer.magic.enabled" ->
      (committer == "magic").toString,
    "spark.sql.sources.commitProtocolClass" ->
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class" ->
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
    "spark.hadoop.fs.s3a.fast.upload" -> "true",
    "spark.hadoop.fs.s3a.fast.upload.buffer" -> "disk",
    "spark.hadoop.fs.s3a.multipart.size" -> "64M",
    "spark.hadoop.fs.s3a.block.size" -> "128M",
    "spark.hadoop.fs.s3a.connection.maximum" -> "96",
    "spark.hadoop.fs.s3a.threads.max" -> "64")

  /** [[builder]] with the [[s3aConfigs]] preset applied. */
  def s3aBuilder(master: String = "local[32]",
                 shufflePartitions: Int = 32,
                 committer: String = "magic"): SparkSession.Builder =
    s3aConfigs(committer).foldLeft(builder(master, shufflePartitions)) {
      case (b, (k, v)) => b.config(k, v)
    }
}
