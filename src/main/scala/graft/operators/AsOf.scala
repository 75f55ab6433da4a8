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
  * The payload is carried as ONE struct, not column-by-column: a right
  * row's struct is non-null even when every field inside it is null, so a
  * null payload VALUE in the matching row never back/forward-fills from a
  * different right row (per-column carry would stitch together a
  * composite row that never existed).
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
               payloadCols: Seq[String]): DataFrame =
    joinDirectional(left, right, leftKey, rightKey, leftTs, rightTs,
      payloadCols, backward = true)

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * whose timestamp is >= the left row's timestamp, per key — the
    * "next state change" twin of [[joinAsOf]] (e.g. time-to-next-order,
    * next price revision). Same sort-based shape: the forward frame
    * `(currentRow, unboundedFollowing)` with `first(ignoreNulls)` replaces
    * the backward frame's `last`. Left rows sort BEFORE right rows at
    * equal ts so an exactly-at-ts right row is inside the frame
    * (inclusive >=). Right rows must be unique per (key, ts), as in
    * [[joinAsOf]].
    */
  def joinAsOfForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTs: String, rightTs: String,
                      payloadCols: Seq[String]): DataFrame =
    joinDirectional(left, right, leftKey, rightKey, leftTs, rightTs,
      payloadCols, backward = false)

  private def joinDirectional(left: DataFrame, right: DataFrame,
                              leftKey: String, rightKey: String,
                              leftTs: String, rightTs: String,
                              payloadCols: Seq[String],
                              backward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // the side tag orders the MATCHING boundary row inside the frame:
    // backward (<=): right(0) sorts before left(1) at equal ts;
    // forward  (>=): left(0) sorts before right(1) at equal ts.
    val (rightSide, leftSide) = if (backward) (0, 1) else (1, 0)
    val payloadStruct = struct(payloadCols.map(col): _*)
    val nullPayload = lit(null)
      .cast(org.apache.spark.sql.types.StructType(
        payloadCols.map(c => right.schema(c))))

    val taggedRight = right.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +:
        lit(rightSide).as("__side") +: payloadStruct.as("__p") +: Nil) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +:
        lit(leftSide).as("__side") +: nullPayload.as("__p") +: Nil) ++
        leftCols.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
    val frame =
      if (backward) w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carry =
      if (backward) last(col("__p"), ignoreNulls = true).over(frame)
      else first(col("__p"), ignoreNulls = true).over(frame)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__p", carry)
      .filter(col("__side") === leftSide)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__p").getField(c).as(c)): _*)
  }
}
