package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Proof that the bucketed-table layout delivers co-located joins: with
  * both sides bucketed on the join key, the sort-merge join plan contains
  * NO shuffle exchange — the one-time write cost replaces the dominant
  * per-run exchange of a recurring 100 TB fact-fact join.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val left = (0 until 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    spark.sql("DROP TABLE IF EXISTS graft_bk_left")
    spark.sql("DROP TABLE IF EXISTS graft_bk_right")
    try {
      Tables.writeBucketed(left, "graft_bk_left", Seq("k"), 8, Seq("k"))
      Tables.writeBucketed(right, "graft_bk_right", Seq("k"), 8, Seq("k"))
      val joined = spark.table("graft_bk_left")
        .join(spark.table("graft_bk_right").hint("merge"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right answer
      assert(joined.count() == 1000)
      val row = joined.filter(col("k") === 7L).select("lv", "rv").head
      assert((row.getString(0), row.getDouble(1)) == ("l7", 14.0))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bk_left")
      spark.sql("DROP TABLE IF EXISTS graft_bk_right")
    }
  }

  test("groupBy on the bucket key also skips the exchange") {
    val df = (0 until 500).map(i => (i.toLong % 50, i * 1.0)).toDF("k", "v")
    spark.sql("DROP TABLE IF EXISTS graft_bk_agg")
    try {
      Tables.writeBucketed(df, "graft_bk_agg", Seq("k"), 8)
      val agg = spark.table("graft_bk_agg")
        .groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation should not shuffle:\n$plan")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bk_agg")
  }
}
