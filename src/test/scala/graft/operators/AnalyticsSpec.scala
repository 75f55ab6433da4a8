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
