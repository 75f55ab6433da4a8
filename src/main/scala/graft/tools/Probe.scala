package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe (not part of the library surface).
  * Usage: Probe [sfDir] [queryName...] — prints the executed plan and the
  * noop-sink wall time (2 runs: cold-ish, warm) per query.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (d, names) =
      if (args.nonEmpty && new java.io.File(args.head).isDirectory)
        (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.01", args.toSeq)
    val picked = if (names.nonEmpty) names
      else Seq("q1_pricing_summary", "q5_region_revenue", "s1_cosine_topk",
        "d2_minhash_neardup", "q12_events_hourly")
    picked.foreach { n =>
      println(s"===== PLAN $n =====")
      val df = graft.SparkEntry.queries(n)(spark, d)
      // Execute THIS df's plan before printing: AQE finalizes the plan at
      // runtime (isFinalPlan=true), which is where exchange/stage reuse
      // shows up — the pre-execution print hides ReusedQueryStage. Both
      // `write` and `foreachPartition` wrap the query in a NEW
      // QueryExecution (leaving this instance unfinalized), so drive the
      // executedPlan instance itself.
      df.queryExecution.executedPlan.execute().count()
      println(df.queryExecution.executedPlan.toString)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, d)
          .write.format("noop").mode("overwrite").save()
        println(f"  run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
