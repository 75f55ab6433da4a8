package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order / Morton curve) for scan
  * pruning — the write-side lever that makes 100 TB reads cheap.
  *
  * Parquet data skipping works off per-file (and per-row-group) min/max
  * statistics: a file is skipped when the predicate range misses its
  * bounding box. A single-column sort gives perfect pruning on that
  * column and NONE on any other; interleaving the bits of several
  * columns (the Z-value) clusters rows so every participating column
  * gets tight-ish bounds in every file — multi-dimensional predicates
  * prune on all of them. This is the same technique Delta/Iceberg expose
  * as `OPTIMIZE ... ZORDER BY`; here it is plain Spark: one expression +
  * `repartitionByRange` + `sortWithinPartitions`.
  *
  * The Z-value is a pure integer expression (shifts/masks — codegen'd,
  * no UDF). Columns must be NON-NEGATIVE integers already scaled to
  * `bitsPerCol` bits (rank, bucket, truncated id, epoch-minute, ...);
  * scaling/ranking is the caller's one-time decision because it is
  * data-model knowledge, not something to hide in the operator.
  */
object Layout {

  /** Morton code: bit b of column i lands at position b·n + i. With the
    * default 16 bits × up to 4 columns the result fits a long. Values
    * outside [0, 2^bitsPerCol) are masked (high bits ignored), which
    * keeps the expression total rather than failing mid-write.
    */
  def zValue(cols: Seq[Column], bitsPerCol: Int = 16): Column = {
    val n = cols.length
    require(n >= 2, "z-order needs at least 2 columns")
    require(n * bitsPerCol <= 62, s"$n cols x $bitsPerCol bits exceeds a long")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bitsPerCol
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** Rows clustered along the Z-curve: a range exchange on the Z-value
    * (so files/partitions own contiguous curve segments) plus a
    * within-partition sort (so row groups inside a file stay tight).
    * Write the result with any parquet writer and the min/max stats do
    * the rest. `numPartitions` sizes the output files — at 100 TB pick
    * corpus_bytes / target_file_bytes, not the shuffle default.
    */
  def zOrderBy(df: DataFrame, cols: Seq[Column], numPartitions: Int,
               bitsPerCol: Int = 16): DataFrame = {
    val withZ = df.withColumn("__z", zValue(cols, bitsPerCol))
    withZ
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
