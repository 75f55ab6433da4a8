package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the LATEST right row
  * whose timestamp is <= the left row's timestamp, per key.
  *
  * Spark has no asof join operator. The naive composition — range join
  * plus per-left-row ranking — materializes every (left, right) pair in
  * the time range and explodes at scale. This implementation is the
  * sort-based formulation instead: tag both sides, union them, and run ONE
  * window pass per key ordered by (ts, side) carrying the last non-null
  * right payload forward; left rows then hold exactly the as-of match.
  * Cost: one hash shuffle on the key + one sort — the same price as a
  * sort-merge join, with zero pair explosion, at any scale.
  *
  * Right rows must be unique per (key, ts) — pre-dedup with
  * [[Dedup.exactDedup]] if needed — so ties are impossible and the result
  * is deterministic. A right row at exactly the left timestamp matches
  * (inclusive <=), which the (ts, side) ordering encodes: right sorts
  * before left at equal ts.
  */
object AsOf {

  /** @param left        probe side (events)
    * @param right       reference side (state changes), unique per (key, ts)
    * @param leftKey     join key column in `left`
    * @param rightKey    join key column in `right`
    * @param leftTs      ordering column in `left` (numeric or timestamp)
    * @param rightTs     ordering column in `right`, same type
    * @param payloadCols right columns to attach (null when no match yet)
    */
  def joinAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = payloadCols.map(c => col(c))

    val taggedRight = right.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        payloadCols.map(col)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))) ++
        leftCols.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payloadCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload: _*)
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * whose timestamp is >= the left row's timestamp, per key — the
    * "next state change" twin of [[joinAsOf]] (e.g. time-to-next-order,
    * next price revision). Same sort-based shape: one union, one hash
    * exchange on the key, one window pass — the forward frame
    * `(currentRow, unboundedFollowing)` with `first(ignoreNulls)` replaces
    * the backward frame's `last`. Left rows tag `__side = 0` so a right
    * row at exactly the left timestamp sorts inside the frame
    * (inclusive >=). Right rows must be unique per (key, ts), as in
    * [[joinAsOf]].
    */
  def joinAsOfForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTs: String, rightTs: String,
                      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = payloadCols.map(c => col(c))

    val taggedRight = right.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +: lit(1).as("__side") +:
        payloadCols.map(col)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +: lit(0).as("__side") +:
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))) ++
        leftCols.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = payloadCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }

    carried.filter(col("__side") === 0)
      .select(leftCols.map(col) ++ payload: _*)
  }
}
