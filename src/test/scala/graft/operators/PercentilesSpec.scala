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

  test("ranged (distributed order statistics) path equals the built-in too") {
    val rnd = new scala.util.Random(22)
    val rows = Seq.fill(5000)(
      ("g" + rnd.nextInt(4),
        rnd.nextDouble() * 1e6,
        if (rnd.nextInt(10) == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(rnd.nextInt(50).toDouble)))
    val df = rows.toDF("g", "a", "b").repartition(16)
    val got = Percentiles.exactPercentilesRanged(df, Seq("g"),
      Seq(("a_p50", "a", 0.5), ("a_p99", "a", 0.99), ("b_p25", "b", 0.25)))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val want = df.groupBy("g")
      .agg(expr("percentile(a, 0.5)").as("a_p50"),
        expr("percentile(a, 0.99)").as("a_p99"),
        expr("percentile(b, 0.25)").as("b_p25"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("ranged path: single-row groups, duplicate-heavy values, p=0 and p=1") {
    val df = Seq(("x", 10.0), ("y", 1.0), ("y", 1.0), ("y", 1.0), ("y", 3.0))
      .toDF("g", "v").repartition(8)
    val got = Percentiles.exactPercentilesRanged(df, Seq("g"),
      Seq(("p0", "v", 0.0), ("p50", "v", 0.5), ("p100", "v", 1.0)))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("x", 10.0, 10.0, 10.0), ("y", 1.0, 1.0, 3.0)))
  }

  test("all-null group keeps its row with a null percentile (built-in parity)") {
    val df = Seq(("x", java.lang.Double.valueOf(5.0)),
      ("z", null.asInstanceOf[java.lang.Double]),
      ("z", null.asInstanceOf[java.lang.Double])).toDF("g", "v")
    val got = Percentiles.exactPercentiles(df, Seq("g"), Seq(("p50", "v", 0.5)))
      .orderBy("g").collect()
      .map(r => (r.getString(0), Option(r.get(1))))
    assert(got.toSeq == Seq(("x", Some(5.0)), ("z", None)))
  }
}
