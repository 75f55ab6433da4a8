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
}
