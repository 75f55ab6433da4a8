package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Accuracy contracts for the two sketch queries whose internals are
  * engine-specific and therefore can never hash-match a DuckDB oracle
  * (a1 approx_count_distinct, a3 DataSketches HLL union): the rows-only
  * driver check is backed here by test-gated error bounds against the
  * EXACT distinct counts on the fixture — the same pattern the ANN
  * queries use (rows-only + recall gate).
  */
class SketchAccuracySpec extends SparkSpec {

  // approx_count_distinct's default rsd is 0.05; HLL++ error is
  // approximately normal, so 4σ = 20% is a deterministic-fixture bound
  // that only a broken sketch violates.
  private val eps = 0.20

  test("a1 contract: approx_count_distinct within 4·rsd of exact per group") {
    val li = Tables.table(spark, sf001, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(exact > 0)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= eps,
        s"group ${r.getString(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("a3 contract: HLL estimates within bound, per group and global") {
    val ev = Tables.events(spark, sf001)
    val rows = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val relErr = math.abs(r.getLong(1).toDouble - r.getLong(2)) / r.getLong(2)
      assert(relErr <= eps,
        s"group ${r.getString(0)}: approx=${r.getLong(1)} " +
          s"exact=${r.getLong(2)} relErr=$relErr")
    }
    val g = ev.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("approx"),
      countDistinct(col("user_id")).as("exact")).head()
    val gErr = math.abs(g.getLong(0).toDouble - g.getLong(1)) / g.getLong(1)
    assert(gErr <= eps, s"global: approx=${g.getLong(0)} " +
      s"exact=${g.getLong(1)} relErr=$gErr")
  }

  test("a3 contract: union-merged rollup tracks the direct global sketch") {
    // the mergeability claim a3 sells: union-merging per-group sketches
    // must estimate the global distinct count as well as sketching the
    // raw column directly — no accuracy cliff at the merge
    val ev = Tables.events(spark, sf001)
    val merged = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .head().getLong(0).toDouble
    val direct = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("e"))
      .head().getLong(0).toDouble
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0).toDouble
    assert(math.abs(merged - exact) / exact <= eps,
      s"merged=$merged exact=$exact")
    // merged vs direct should agree far tighter than the error bound —
    // the union keeps max registers, it does not resample
    assert(math.abs(merged - direct) / exact <= 0.05,
      s"merged=$merged direct=$direct exact=$exact")
  }
}
