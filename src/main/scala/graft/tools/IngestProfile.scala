package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the governed ingest loops (p5/p6):
  * times index build and each governed batch separately so fixed
  * per-batch overhead is visible. Usage: IngestProfile [sfDir]
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"== p5 round $round ==")
      val docs = graft.sources.Tables.table(spark, dir, "documents")
      val p = Dedup.MinHashParams(numHashes = 32, bands = 8, shingle = 3,
        threshold = 0.2)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (c1, c2) = (maxId * 3 / 5, maxId * 4 / 5)
      val base = s"/tmp/graft_profile_p5"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val ix = s"$base/ix"; val out = s"$base/out"
      t("writeSignatureIndex") {
        Dedup.writeSignatureIndex(docs.filter(col("doc_id") <= c1),
          "doc_id", "text", ix, p)
      }
      t("initIngestLedger")(Dedup.initIngestLedger(spark, ix))
      t("ingestBatch 0") {
        Dedup.ingestBatchWithIndex(
          docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
          "doc_id", "text", ix, out, batchId = 0L)
      }
      t("ingestBatch 1") {
        Dedup.ingestBatchWithIndex(docs.filter(col("doc_id") > c2),
          "doc_id", "text", ix, out, batchId = 1L)
      }
      t("read result") {
        spark.read.parquet(s"$out/batch_id=0").count()
        spark.read.parquet(s"$out/batch_id=1").count()
      }
    }
    spark.stop()
  }
}
