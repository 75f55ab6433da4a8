package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match left rows to right rows with the same key
  * whose timestamp falls in a window anchored at the left timestamp —
  * the "events within N minutes of X" / "readings during the session"
  * join shape that a training-data pipeline uses for context assembly
  * and attribution, and that the reference surface lacks entirely
  * (no joins at all — SURVEY.md §2.2).
  *
  * Semantics: keep (l, r) where `l.key = r.key` and
  * `l.ts + lower <= r.ts < l.ts + upper` (half-open, so adjacent windows
  * never double-count a boundary row).
  *
  * Scale shape (100 TB): the EQUI key is load-bearing — Spark plans this
  * as a hash-partitioned sort-merge join on the key with the range
  * predicate evaluated inside each key group, never a broadcast
  * nested-loop over the cross product. Both sides shuffle once on the
  * key; within a key group the matched row count is bounded by the
  * window width × event rate, not the group size squared. Callers with
  * a dominant hot key should pre-bucket the timestamp (compose with
  * [[Skew]]) — the classic refinement for range joins on skewed keys.
  */
object RangeJoin {

  /** @param left     anchor side (keeps its columns)
    * @param right    probe side (keeps its columns; key/ts columns must
    *                 not collide with left's — alias before calling)
    * @param leftKey  equi-join key on the left
    * @param rightKey equi-join key on the right
    * @param leftTs   anchor timestamp (numeric, e.g. epoch seconds)
    * @param rightTs  probe timestamp (same unit)
    * @param lower    window start offset (inclusive), in ts units
    * @param upper    window end offset (exclusive), > lower
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   lower: Long, upper: Long): DataFrame = {
    require(upper > lower, s"empty window: [$lower, $upper)")
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) + lit(lower) &&
        col(rightTs) < col(leftTs) + lit(upper))
  }
}
