package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over event streams: ordered funnels and
  * cohort retention — the two aggregate shapes every event warehouse
  * serves, expressed as decomposable aggregations so they hold at any
  * event volume.
  */
object Analytics {

  /** Ordered funnel: for each user, the earliest timestamp of step 1,
    * then the earliest step-2 event AT OR AFTER it, and so on —
    * `steps_reached` is the length of the completed prefix. Spark has no
    * MATCH_RECOGNIZE; the standard formulation is one conditional-min
    * aggregation per step (t_{i+1} = min ts where type = step_{i+1} and
    * ts >= t_i), which needs the previous step's result — k-1 re-joins of
    * the event table, ALL keyed on the user column.
    *
    * Scale shape: every groupBy/join in the chain shares the user-key
    * partitioning, so the exchange is reused across steps rather than
    * re-shuffled; each aggregation is a decomposable conditional min with
    * map-side partials. Nothing is quadratic; no windows over the full
    * event history.
    */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    val first = events.groupBy(col(userCol))
      .agg(min(when(col(typeCol) === steps.head, col(tsCol))).as("t1"))
    val full = steps.drop(1).zipWithIndex.foldLeft(first) {
      case (acc, (st, i)) =>
        val prev = s"t${i + 1}"
        val cur = s"t${i + 2}"
        val carried = (1 to i + 1).map(j => col(s"t$j"))
        events.join(acc, Seq(userCol))
          .groupBy(col(userCol) +: carried: _*)
          .agg(min(when(col(typeCol) === st && col(tsCol) >= col(prev),
            col(tsCol))).as(cur))
    }
    val stepCols = (1 to steps.length).map(j => col(s"t$j"))
    // t_{i+1} non-null implies t_i non-null by construction, so the count
    // of non-null step timestamps IS the completed prefix length
    full.select((col(userCol) +: stepCols) :+
      stepCols.map(c => when(c.isNotNull, lit(1L)).otherwise(lit(0L)))
        .reduce(_ + _).as("steps_reached"): _*)
      .orderBy(col(userCol))
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * FIRST event; each later active week counts them at that offset.
    * Output: (cohort_week, week_offset, n_users), the retention triangle.
    *
    * Scale shape: one min-aggregation for cohorts, one distinct
    * (user, week) projection for activity — both decomposable on the user
    * key — then a count-distinct per (cohort, offset) cell whose shuffle
    * is O(users · active weeks), never O(events).
    *
    * @param weekSecs cohort bucket width in seconds (default 7 days)
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsSecsCol: String,
                       weekSecs: Long = 7L * 24 * 3600): DataFrame = {
    val week = (col(tsSecsCol) / lit(weekSecs)).cast("long")
    val cohorts = events
      .groupBy(col(userCol))
      .agg(min(week).as("cohort_week"))
    val active = events
      .select(col(userCol), week.as("active_week"))
      .distinct()
    active.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (col("active_week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
