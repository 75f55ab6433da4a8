package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntersectCountRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("rule rewrites size(array_intersect) over sorted long arrays, same result") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntersectCountRewrite
    try {
      // non-literal input so ConvertToLocalRelation cannot fold the plan away
      val df = spark.range(2)
        .select(array(col("id"), col("id") + 2).as("a"),
          array(col("id") + 1, col("id") * 3).as("b"))
        .select(size(array_intersect(array_sort(col("a")), array_sort(col("b"))))
          .as("n"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_intersect_count"))
      // id=0: a=[0,2] b=[0,1] -> 1 common; id=1: a=[1,3] b=[2,3] -> 1 common
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 1))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == IntersectCountRewrite)
    }
  }

  test("rule does NOT fire on unsorted or non-long inputs") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntersectCountRewrite
    try {
      val unsorted = Seq((Seq(3L, 1L), Seq(1L, 9L))).toDF("a", "b")
        .select(size(array_intersect(col("a"), col("b"))).as("n"))
      assert(!unsorted.queryExecution.optimizedPlan.toString.contains("graft_intersect_count"))
      assert(unsorted.collect()(0).getInt(0) == 1)
      val strings = Seq((Seq("x", "y"), Seq("y"))).toDF("a", "b")
        .select(size(array_intersect(array_sort(col("a")), array_sort(col("b")))).as("n"))
      assert(!strings.queryExecution.optimizedPlan.toString.contains("graft_intersect_count"))
      assert(strings.collect()(0).getInt(0) == 1)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == IntersectCountRewrite)
    }
  }
}
