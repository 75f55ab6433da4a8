package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Exact interpolating percentiles without the built-in `percentile`
  * aggregate.
  *
  * Why not the built-in: Spark's `Percentile` is a TypedImperativeAggregate
  * that buffers a value->count map PER GROUP in executor memory — with few
  * groups and 100 TB of rows that buffer is a scale hazard (it cannot
  * spill). Why not a naive `row_number` window: it shuffles EVERY row into
  * per-group partitions — at 3 groups that is 3 tasks doing all the work
  * regardless of cluster size.
  *
  * Two scale-shaped strategies, selectable per call site:
  *
  *  - [[exactPercentiles]] (histogram): `groupBy(g, v).count` — a
  *    decomposable hash aggregate whose map-side partial reduction
  *    collapses each partition to its distinct (group, value) pairs BEFORE
  *    the exchange — then a cumulative-sum window over the per-group
  *    histogram assigns each value its 1-based rank range [cum-n+1, cum].
  *    Optimal when values repeat (integer metrics, bounded domains): the
  *    shuffle carries the histogram, not the corpus. The per-group window
  *    is serial in the number of DISTINCT values — use the ranged variant
  *    when that count is itself corpus-sized.
  *
  *  - [[exactPercentilesRanged]] (distributed order statistics): ONE
  *    `repartitionByRange(g, v)` exchange, a parallel per-partition sort,
  *    a streaming per-partition histogram fold (`mapPartitions` — the
  *    legitimate per-partition-imperative case), then partition-offset
  *    cumulation over a tiny (partition, group) summary joined back
  *    broadcast. No per-group serial stage at all: sort AND rank work
  *    parallelize by range split, so high-cardinality continuous columns
  *    (prices, scores, timestamps) scale with the cluster, not the group
  *    count. Equal (g, v) keys land in one range partition (RangePartitioner
  *    binary-searches boundaries), so the local fold sees every duplicate
  *    of a value together and emits exact global rank ranges.
  *
  * Both reproduce the built-in bit for bit: nulls excluded per column,
  * linear interpolation at rank p·(n-1) — exact value when the rank is
  * integral, else lv·(1-frac) + hv·frac. Groups whose value columns are
  * entirely null keep their row (null percentile) when `keepAllGroups`
  * (the default), matching `groupBy().agg(percentile(...))`; pass false to
  * skip the distinct-groups anchor scan when every group is known to have
  * at least one non-null value in the FIRST spec column.
  */
object Percentiles {

  /** Histogram strategy — one row per `groupCols` group with a column per
    * (outputName, valCol, p) spec. See the object doc for when to prefer
    * [[exactPercentilesRanged]].
    */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String],
                       specs: Seq[(String, String, Double)],
                       keepAllGroups: Boolean = true): DataFrame =
    finish(df, groupCols, specs, keepAllGroups) { (gcols, c) =>
      val hist = df
        .select(gcols :+ col(c).cast("double").as("__v"): _*)
        .filter(col("__v").isNotNull)
        .groupBy(gcols :+ col("__v"): _*)
        .agg(count(lit(1)).as("__n"))
      // Running and total counts share ONE window ordering (one exchange +
      // one sort of the histogram; two frames in the same WindowExec).
      val wOrd = Window.partitionBy(gcols: _*).orderBy(col("__v"))
      hist
        .withColumn("__cum", sum(col("__n"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__tot", sum(col("__n"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    }

  /** Range-partitioned distributed-order-statistics strategy — same
    * result and signature as [[exactPercentiles]]; see the object doc.
    */
  def exactPercentilesRanged(df: DataFrame, groupCols: Seq[String],
                             specs: Seq[(String, String, Double)],
                             keepAllGroups: Boolean = true): DataFrame =
    finish(df, groupCols, specs, keepAllGroups) { (gcols, c) =>
      val proj = df
        .select(gcols :+ col(c).cast("double").as("__v"): _*)
        .filter(col("__v").isNotNull)
      val nG = gcols.length
      val rangeCols = gcols :+ col("__v")
      val ranged = proj.repartitionByRange(rangeCols: _*)
      val localSchema = StructType(proj.schema.fields ++ Seq(
        StructField("__pid", IntegerType, nullable = false),
        StructField("__n", LongType, nullable = false),
        StructField("__cum", LongType, nullable = false)))
      // Streaming fold over the partition-sorted rows: one output row per
      // distinct (group, value) with its count and group-local running
      // count WITHIN this partition. O(1) memory, no per-group buffering.
      val local = ranged.sortWithinPartitions(rangeCols: _*)
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          new Iterator[Row] {
            private var cur: Row = if (it.hasNext) it.next() else null
            private var cum = 0L
            def hasNext: Boolean = cur != null
            // Allocation-free group comparison (this runs once per input
            // row on the hot path).
            private def groupMatches(g: Array[Any]): Boolean = {
              var i = 0
              while (i < nG) {
                if (cur.get(i) != g(i)) return false
                i += 1
              }
              true
            }
            def next(): Row = {
              val g = Array.tabulate[Any](nG)(cur.get)
              val v = cur.getDouble(nG)
              var n = 0L
              while (cur != null && groupMatches(g) && cur.getDouble(nG) == v) {
                n += 1
                cur = if (it.hasNext) it.next() else null
              }
              val sameGroup = cur != null && groupMatches(g)
              cum += n
              // Seq[Any], NOT Seq(...): numeric unification would widen
              // pid/n/cum to Double and break the row encoder.
              val out = Row.fromSeq(g.toSeq ++ Seq[Any](v, pid, n, cum))
              if (!sameGroup) cum = 0L
              out
            }
          }
        }(Encoders.row(localSchema))
      // Tiny (partition, group) totals -> global offset of each partition
      // within its group, and the group total; broadcast back. Derived
      // from `ranged` (NOT `local`) so this branch reuses the range
      // exchange and skips the sort: a map-side partial count collapses
      // each partition to its group counts before the tiny agg exchange.
      // Partition ids are consistent across the two branches because the
      // identical exchanges deduplicate (ReuseExchange) — and
      // RangePartitioner's boundary sampling is seeded by partition index,
      // so even a recompute yields identical boundaries.
      val ptot = ranged.withColumn("__pid", spark_partition_id())
        .groupBy(col("__pid") +: gcols: _*)
        .agg(count(lit(1)).as("__ptot"))
      val wOff = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      val offsets = ptot
        .withColumn("__off", coalesce(sum(col("__ptot"))
          .over(wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("__tot", sum(col("__ptot"))
          .over(wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .drop("__ptot")
      local.join(broadcast(offsets), "__pid" +: groupCols)
        .withColumn("__cum", col("__cum") + col("__off"))
        .drop("__pid", "__off")
    }

  /** Shared finish: per-spec conditional aggregation over rank-annotated
    * histogram rows (columns `__v`, `__n`, `__cum`, `__tot` per group),
    * then the interpolation projection and the per-column joins.
    */
  private def finish(df: DataFrame, groupCols: Seq[String],
                     specs: Seq[(String, String, Double)],
                     keepAllGroups: Boolean)
                    (ranked: (Seq[Column], String) => DataFrame): DataFrame = {
    require(specs.nonEmpty, "exactPercentiles: at least one (name, col, p) spec")
    specs.foreach { case (_, _, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentile p must be in [0,1], got $p") }
    // Global (ungrouped) percentiles: run the grouped machinery over one
    // synthetic constant group, then drop it.
    if (groupCols.isEmpty) {
      require(!df.columns.contains("__g"),
        "exactPercentiles: input already has a '__g' column — the global " +
          "path would silently overwrite it")
      return finish(df.withColumn("__g", lit(1)), Seq("__g"), specs,
        keepAllGroups)(ranked).drop("__g")
    }
    val gcols = groupCols.map(col)
    val perCol = specs.map(_._2).distinct.map { c =>
      val ps = specs.filter(_._2 == c).map(s => (s._1, s._3))
      val aggs = ps.flatMap { case (name, p) =>
        val pos = lit(p) * (col("__tot") - 1).cast("double")
        val lo = floor(pos).cast("long") + 1
        val frac = pos - floor(pos)
        // Value at rank r is the histogram row whose range covers r:
        // cum - n < r <= cum.
        def at(r: Column): Column =
          col("__cum") - col("__n") < r && r <= col("__cum")
        Seq(
          max(when(at(lo), col("__v"))).as(s"__lv_$name"),
          max(when(at(lo + 1), col("__v"))).as(s"__hv_$name"),
          max(when(at(lo), frac)).as(s"__fr_$name"))
      }
      ranked(gcols, c).groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
    }
    // All-null groups must survive with null percentiles (histograms drop
    // them), so optionally anchor on the distinct group set.
    val joined =
      if (keepAllGroups)
        perCol.foldLeft(df.select(gcols: _*).distinct())(
          (acc, d) => acc.join(d, groupCols, "left"))
      else perCol.reduce((a, b) => a.join(b, groupCols, "full_outer"))
    specs.foldLeft(joined) { case (d, (name, _, _)) =>
      val lv = col(s"__lv_$name"); val hv = col(s"__hv_$name")
      val fr = col(s"__fr_$name")
      d.withColumn(name,
        when(fr === 0.0, lv)
          .otherwise(lv * (lit(1.0) - fr) + coalesce(hv, lv) * fr))
        .drop(s"__lv_$name", s"__hv_$name", s"__fr_$name")
    }
  }
}
