package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("sort-based exactPercentiles equals the built-in percentile aggregate") {
    val rnd = new scala.util.Random(21)
    val rows = Seq.fill(5000)(
      ("g" + rnd.nextInt(4),
        rnd.nextInt(1000).toDouble,
        if (rnd.nextInt(10) == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(rnd.nextDouble() * 100)))
    val df = rows.toDF("g", "a", "b")
    val got = Percentiles.exactPercentiles(df, Seq("g"),
      Seq(("a_p50", "a", 0.5), ("a_p95", "a", 0.95), ("b_p25", "b", 0.25)))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val want = df.groupBy("g")
      .agg(expr("percentile(a, 0.5)").as("a_p50"),
        expr("percentile(a, 0.95)").as("a_p95"),
        expr("percentile(b, 0.25)").as("b_p25"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("single-row and two-row groups interpolate correctly") {
    val df = Seq(("x", 10.0), ("y", 1.0), ("y", 3.0)).toDF("g", "v")
    val got = Percentiles.exactPercentiles(df, Seq("g"), Seq(("p50", "v", 0.5)))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("x", 10.0), ("y", 2.0)))
  }
}
