package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q5_region_revenue", "s1_cosine_topk",
        "d2_minhash_neardup", "q12_events_hourly")
    names.foreach { n =>
      println(s"===== PLAN $n =====")
      val df = graft.SparkEntry.queries(n)(spark, d)
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
