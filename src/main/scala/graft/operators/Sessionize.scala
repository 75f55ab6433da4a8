package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log — a core training-data /
  * clickstream operator the reference lacks.
  *
  * Batch formulation: per user, a new session starts when the gap to the
  * previous event exceeds `gapSeconds`. Implemented as the classic
  * lag → boundary-flag → running-sum pattern: two window passes over the
  * SAME (user_id) partitioning, so Catalyst plans ONE hash exchange and
  * one sort — the partitioning is reused across both windows and the
  * final aggregation.
  *
  * At 100 TB: a single shuffle on user_id; per-user event counts are
  * small, so no skew handling is needed beyond AQE. The streaming
  * counterpart with bounded state is
  * [[graft.streaming.StreamOps.sessionizeStream]].
  */
object Sessionize {

  /** Per-session summary: (user_id, session_no, n_events, start/end secs,
    * duration). `tsSecsCol` must be an epoch-seconds bigint column;
    * `orderCol` breaks timestamp ties deterministically.
    */
  def sessionSummaries(events: DataFrame, userCol: String, tsSecsCol: String,
                       orderCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsSecsCol), col(orderCol))
    val flagged = events
      .withColumn("__prev", lag(col(tsSecsCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          col(tsSecsCol) - col("__prev") > gapSeconds, 1L).otherwise(0L))
    val numbered = flagged
      .withColumn("session_no",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    numbered
      .groupBy(col(userCol), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsSecsCol)).as("start_secs"),
        max(col(tsSecsCol)).as("end_secs"))
      .withColumn("duration_secs", col("end_secs") - col("start_secs"))
      .orderBy(col(userCol), col("session_no"))
  }
}
