package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regular-grid resampling over event streams: aggregate into fixed
  * buckets, then fill the EMPTY buckets, because "no events between
  * 02:00 and 04:00" is signal (an outage, a dead feed) that a plain
  * GROUP BY silently drops — downstream anomaly detection and rate
  * charts need the explicit zero rows.
  */
object TimeSeries {

  /** Per-key bucket aggregation with gap filling: every `stepSecs` bucket
    * between each key's first and last event appears exactly once, with
    * `cnt = 0`, `sum_value = 0.0` for the empty ones.
    *
    * Scale shape: the actual aggregation is one decomposable
    * partial→final pass; the grid generates from the per-key (min, max)
    * span — `sequence` + `explode` fans out AFTER aggregation, so the
    * generator works on one row per key, not per event; the fill join is
    * per-key-partitioned and AQE broadcasts the small side. Grid size is
    * span/step rows per key — bound step to the span you actually chart.
    */
  def fillGaps(events: DataFrame, keyCol: String, epochSecs: Column,
               valueCol: String, stepSecs: Long): DataFrame = {
    require(stepSecs > 0, "stepSecs must be positive")
    val bucket = (epochSecs - pmod(epochSecs, lit(stepSecs))).as("bucket")
    val actual = events
      .select(col(keyCol), bucket, col(valueCol))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"), round(sum(col(valueCol)), 2).as("sum_value"))
    val grid = actual.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepSecs))).as("bucket"))
    grid.join(actual, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col(keyCol), col("bucket"))
  }
}
