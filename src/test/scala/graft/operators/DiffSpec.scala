package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val oldDf = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "s", "v")
    val newDf = Seq(
      (2L, "b", 20.0),  // unchanged
      (3L, "c", 31.0),  // changed
      (4L, "d", 40.0)   // added
    ).toDF("id", "s", "v")
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff classifies null-key rows by the side they came from") {
    val oldDf = Seq((Option(1L), "a"), (Option.empty[Long], "ghost"))
      .toDF("id", "s")
    val newDf = Seq((Option(1L), "a"), (Option.empty[Long], "spirit"))
      .toDF("id", "s")
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("id"))
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
    // null keys never equi-join: the old one is a removal, the new one an
    // addition — neither may masquerade as the other
    assert(got.count(_ == (None -> "removed")) == 1)
    assert(got.count(_ == (None -> "added")) == 1)
    assert(got.contains(Some(1L) -> "unchanged"))
  }

  test("snapshotDiff compares null payloads null-safely") {
    val oldDf = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "s")
    val newDf = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "s")
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("distributionDrift computes smoothed shares, KL and TV terms") {
    val a = Seq("web", "web", "web", "books").toDF("source")
    val b = Seq("web", "books", "wiki", "wiki").toDF("source")
    val rows = Diff.distributionDrift(a, b, "source").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // 3 categories in the union; totals 4 and 4 -> smoothed denominator 7
    val (pWebA, pWebB) = (4.0 / 7.0, 2.0 / 7.0)
    assert(rows("web")._1 == 3L && rows("web")._2 == 1L)
    assert(rows("web")._3 == r6(pWebA) && rows("web")._4 == r6(pWebB))
    assert(rows("web")._5 == r6(pWebA * math.log(pWebA / pWebB)))
    assert(rows("web")._6 == r6((pWebA - pWebB).abs / 2.0))
    // category absent from a: count 0, still a finite negative KL term
    assert(rows("wiki")._1 == 0L && rows("wiki")._2 == 2L)
    val (pWikiA, pWikiB) = (1.0 / 7.0, 3.0 / 7.0)
    assert(rows("wiki")._5 == r6(pWikiA * math.log(pWikiA / pWikiB)))
    assert(rows("wiki")._5 < 0.0)
    // TV distance (sum of tv_term) is symmetric and in [0, 1]
    val tv = rows.values.map(_._6).sum
    assert(tv > 0.0 && tv <= 1.0)
  }
}

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("fillGaps emits explicit zero rows for empty buckets") {
    // key 'a': events at t=0 and t=250 with a 100s step -> gap at 100
    val df = Seq(("a", 0L, 1.0), ("a", 250L, 2.0), ("b", 50L, 3.0))
      .toDF("k", "secs", "value")
    val got = TimeSeries.fillGaps(df, "k", col("secs"), "value", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", 0L, 1L, 1.0), ("a", 100L, 0L, 0.0), ("a", 200L, 1L, 2.0),
      ("b", 0L, 1L, 3.0)))
  }

  test("fillGaps grid is dense: every step between lo and hi present once") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 50).map(_ => ("k", rnd.nextInt(10000).toLong, 1.0))
      .toDF("k", "secs", "value")
    val buckets = TimeSeries.fillGaps(df, "k", col("secs"), "value", 60L)
      .collect().map(_.getLong(1))
    assert(buckets.distinct.length == buckets.length)
    assert(buckets.toSeq == (buckets.min to buckets.max by 60L).toSeq)
  }
}
