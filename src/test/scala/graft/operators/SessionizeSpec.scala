package graft.operators

import graft.SparkSpec
import graft.streaming.StreamOps
import graft.streaming.StreamOps.UserEvent

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionization splits on gap, numbers sessions per user") {
    val df = Seq(
      // user 1: two sessions (gap 2000 > 1800 between 3rd and 4th event)
      (1L, 0L, 10L), (1L, 1L, 100L), (1L, 2L, 1000L),
      (1L, 3L, 3000L), (1L, 4L, 3100L),
      // user 2: one session
      (2L, 5L, 50L), (2L, 6L, 60L)).toDF("user_id", "event_id", "ts_secs")
    val out = Sessionize.sessionSummaries(df, "user_id", "ts_secs", "event_id", 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 10L, 1000L, 990L),
      (1L, 2L, 2L, 3000L, 3100L, 100L),
      (2L, 1L, 2L, 50L, 60L, 10L)))
  }

  test("streaming sessionization closes a session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val out = StreamOps.sessionizeStream(mem.toDS(), gapSeconds = 1800L)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(UserEvent(1L, 10L), UserEvent(1L, 100L))
      q.processAllAvailable()
      // session still open — nothing emitted yet
      assert(spark.table("sessions").count() == 0)

      // an event past the gap closes the first session
      mem.addData(UserEvent(1L, 5000L))
      q.processAllAvailable()
      val rows = spark.table("sessions").as[StreamOps.SessionOut].collect()
      assert(rows.toSeq == Seq(StreamOps.SessionOut(1L, 10L, 100L, 2L)))
    } finally q.stop()
  }
}

class GraftExtensionsSpec extends SparkSpec {
  test("extensions expose graft functions to a fresh SQL-only session") {
    val s2 = graft.GraftSession.builder(master = "local[2]")
      .getOrCreate().newSession()
    graft.functions.GraftFunctions.register(s2)
    val v = s2.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(v == 1.0)
  }
}
