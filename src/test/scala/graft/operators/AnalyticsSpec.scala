package graft.operators

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("funnelSteps enforces step order and counts the completed prefix") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2 purchases BEFORE clicking -> purchase must not count
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // u3 never views -> later events can't start the funnel
      (3L, 10L, "click"), (3L, 20L, "purchase"),
      // u4 same-timestamp boundary: click AT the view ts counts (>=)
      (4L, 10L, "view"), (4L, 10L, "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnelSteps(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 2L))
  }

  test("funnelSteps picks the EARLIEST valid timestamp per step") {
    val events = Seq(
      (1L, 50L, "view"), (1L, 10L, "view"),      // t1 = 10
      (1L, 5L, "click"), (1L, 40L, "click")      // click@5 < t1 -> t2 = 40
    ).toDF("user_id", "ts", "event_type")
    val r = Analytics.funnelSteps(events, "user_id", "ts", "event_type",
      Seq("view", "click")).collect().head
    assert(r.getLong(1) == 10L && r.getLong(2) == 40L && r.getLong(3) == 2L)
  }

  test("qualityBinMix bins by rank and keeps rate-0 bins empty, " +
    "rate-1 bins whole") {
    import org.apache.spark.sql.functions.col
    // 40 rows, 4 bins of 10 by ascending score; bin 1 dropped entirely,
    // bin 4 kept entirely, middle bins hash-thinned
    val df = (1 to 40).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val out = Sampling.qualityBinMix(df, "id", "score",
      rates = Seq(0.0, 0.5, 0.5, 1.0))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bins = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!bins.contains(1L))              // rate 0.0 -> nothing survives
    assert(bins(4L) == 10)                  // rate 1.0 -> the whole bin
    // middle bins: some but not all rows survive the hash thinning
    assert(bins.getOrElse(2L, 0) + bins.getOrElse(3L, 0) > 0)
    assert(bins.getOrElse(2L, 0) < 10 || bins.getOrElse(3L, 0) < 10)
    // bin assignment follows the (score, id) rank: ids 31..40 are bin 4
    assert(out.filter(_._2 == 4L).map(_._1).forall(id => id > 30))
  }

  test("qualityBinMixBoundaries is bit-identical to the ntile formulation") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(23)
    // heavy score TIES (scores drawn from 10 values over 200 rows) — the
    // case where value-only boundaries would split differently than
    // ntile; pair-valued boundaries must match exactly
    val df = (1 to 200).map(i => (i.toLong, (rnd.nextInt(10) / 3.0)))
      .toDF("id", "score")
    val rates = Seq(0.0, 0.3, 0.7, 1.0, 0.5)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val ntileOut = rows(Sampling.qualityBinMix(df, "id", "score", rates))
    val boundsOut = rows(Sampling.qualityBinMixBoundaries(df, "id", "score", rates))
    assert(ntileOut.nonEmpty && boundsOut == ntileOut)
  }

  test("qualityBinMixBoundaries stays ntile-exact at 100 bins") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(41)
    // 100 bins over 500 rows with score ties — the literal boundary
    // array must keep pair-exact tie handling at a bin count the old
    // nested when-chain would have made codegen-hostile
    val df = (1 to 500).map(i => (i.toLong, (rnd.nextInt(25) / 7.0)))
      .toDF("id", "score")
    val rates = (1 to 100).map(i => (i % 4) * 0.25 + 0.25)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ntileOut = rows(Sampling.qualityBinMix(df, "id", "score", rates))
    val boundsOut = rows(Sampling.qualityBinMixBoundaries(df, "id", "score", rates))
    assert(ntileOut.nonEmpty && boundsOut == ntileOut)
  }

  test("qualityBinMixBoundaries handles more bins than rows (degenerate)") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "score")
    val rates = Seq.fill(10)(1.0)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(rows(Sampling.qualityBinMixBoundaries(df, "id", "score", rates)) ==
      rows(Sampling.qualityBinMix(df, "id", "score", rates)))
  }

  test("retentionCohorts builds the triangle from first-event cohorts") {
    val w = 7L * 24 * 3600
    val events = Seq(
      (1L, 0L * w + 5), (1L, 1L * w + 5), (1L, 3L * w + 5), // cohort 0
      (2L, 0L * w + 9),                                     // cohort 0, week 0 only
      (3L, 1L * w + 2), (3L, 2L * w + 2)                    // cohort 1
    ).toDF("user_id", "ts_secs")
    val out = Analytics.retentionCohorts(events, "user_id", "ts_secs")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}
