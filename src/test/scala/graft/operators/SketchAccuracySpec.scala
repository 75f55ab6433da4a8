package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Accuracy contracts for the sketch queries whose internals are
  * engine-specific and can never hash-match a DuckDB recomputation (a1
  * approx_count_distinct, a3 DataSketches HLL union, a6/a7 KMV set
  * algebra, a8 KLL quantile rollup): since r18 their registry rows are
  * SELF-VERIFYING (the
  * query computes the exact answer beside the estimate and the oracle
  * hash-checks a within-bound verdict), and these specs gate the same
  * bounds directly with the measured errors `info`d — the estimator-
  * level artifact behind the oracle rows, same pattern as the ANN
  * recall gates.
  *
  * Gated at BOTH fixture scales: sf0.001 exercises the sparse /
  * near-exact register regime; sf0.1 (600k lineitem rows, 100k events)
  * is where HLL++ actually estimates — per-group cardinalities in the
  * tens of thousands, far past the sparse-mode cutoff, so the measured
  * relative error here is the real rsd-bounded behavior a deployment
  * sees, not sparse-mode exactness. Measured errors are `info`d so the
  * suite log doubles as the accuracy artifact per round.
  */
class SketchAccuracySpec extends SparkSpec {

  // approx_count_distinct's default rsd is 0.05; HLL++ error is
  // approximately normal, so 4σ = 20% is a deterministic-fixture bound
  // that only a broken sketch violates.
  private val eps = 0.20

  private val dirs = Seq("sf0.001" -> sf001, "sf0.1" -> "/root/testdata/sf0.1")

  test("a1 contract: approx_count_distinct within 4·rsd of exact per group") {
    for ((label, dir) <- dirs) {
      val li = Tables.table(spark, dir, "lineitem")
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
        info(f"$label a1 group ${r.getString(0)}: approx=${approx.toLong} " +
          f"exact=${exact.toLong} relErr=$relErr%.4f")
        assert(relErr <= eps,
          s"$label group ${r.getString(0)}: approx=$approx exact=$exact " +
            s"relErr=$relErr")
      }
    }
  }

  test("a2 contract: production-accuracy quantile sketch tracks the exact ranks") {
    // a2 itself pins accuracy = 1e6 so the sketch is rank-EXACT at the
    // verify SF (that is what lets its DuckDB oracle hash-match); a
    // deployment uses the default accuracy 1e4. This gates the default's
    // error at sf0.1: rank error <= n·1e-4 = 60 of ~600k rows, which on
    // this value distribution (~4000 rows per distinct quantity) can
    // shift the reported quantile by at most one neighboring value.
    val li = Tables.table(spark, "/root/testdata/sf0.1", "lineitem")
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, array(0.5, 0.9))").as("q"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1)(0), r.getSeq[Double](1)(1))).toMap
    val groups = li.select(col("l_returnflag"), col("l_quantity"))
      .collect().groupBy(_.getString(0))
    approx.foreach { case (g, (p50, p90)) =>
      val vals = groups(g).map(_.getDouble(1)).sorted
      def disc(p: Double) = vals(math.ceil(p * vals.length).toInt - 1)
      val (e50, e90) = (disc(0.5), disc(0.9))
      info(f"a2 default-accuracy group $g: p50 $p50 (exact $e50), " +
        f"p90 $p90 (exact $e90)")
      assert(math.abs(p50 - e50) <= 1.0, s"$g p50: approx $p50 exact $e50")
      assert(math.abs(p90 - e90) <= 1.0, s"$g p90: approx $p90 exact $e90")
    }
  }

  test("a3 contract: HLL estimates within bound, per group and global") {
    for ((label, dir) <- dirs) {
      val ev = Tables.events(spark, dir)
      val rows = ev.groupBy(col("event_type"))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("approx"),
          countDistinct(col("user_id")).as("exact"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val relErr = math.abs(r.getLong(1).toDouble - r.getLong(2)) / r.getLong(2)
        info(f"$label a3 group ${r.getString(0)}: approx=${r.getLong(1)} " +
          f"exact=${r.getLong(2)} relErr=$relErr%.4f")
        assert(relErr <= eps,
          s"$label group ${r.getString(0)}: approx=${r.getLong(1)} " +
            s"exact=${r.getLong(2)} relErr=$relErr")
      }
      val g = ev.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("approx"),
        countDistinct(col("user_id")).as("exact")).head()
      val gErr = math.abs(g.getLong(0).toDouble - g.getLong(1)) / g.getLong(1)
      info(f"$label a3 global: approx=${g.getLong(0)} exact=${g.getLong(1)} " +
        f"relErr=$gErr%.4f")
      assert(gErr <= eps, s"$label global: approx=${g.getLong(0)} " +
        s"exact=${g.getLong(1)} relErr=$gErr")
    }
  }

  test("a3 contract: union-merged rollup tracks the direct global sketch") {
    // the mergeability claim a3 sells: union-merging per-group sketches
    // must estimate the global distinct count as well as sketching the
    // raw column directly — no accuracy cliff at the merge
    for ((label, dir) <- dirs) {
      val ev = Tables.events(spark, dir)
      val merged = ev.groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
        .head().getLong(0).toDouble
      val direct = ev
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("e"))
        .head().getLong(0).toDouble
      val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0).toDouble
      info(f"$label a3 merged=${merged.toLong} direct=${direct.toLong} " +
        f"exact=${exact.toLong}")
      assert(math.abs(merged - exact) / exact <= eps,
        s"$label merged=$merged exact=$exact")
      // merged vs direct should agree far tighter than the error bound —
      // the union keeps max registers, it does not resample
      assert(math.abs(merged - direct) / exact <= 0.05,
        s"$label merged=$merged direct=$direct exact=$exact")
    }
  }

  test("a8 contract: KLL quantile RANK error within bound per group AND " +
      "through the union-merge rollup") {
    // KLL bounds rank error, not value error (k=200 published normalized
    // rank error ~1.65%); the gate measures the true rank of every
    // estimated quantile at five probe points, per group and for the
    // kll_sketch_merge-folded global sketch — the merge must not cost
    // accuracy (the a8 rollup claim).
    val probes = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val bound = 0.033 // 2x published
    for ((label, dir) <- dirs) {
      val li = Tables.table(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
      val perSk = li.groupBy(col("l_returnflag"))
        .agg(expr("kll_sketch_agg_double(l_quantity)").as("sk"))
      val sks = perSk.collect().map(r =>
        r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      val mergedSk = perSk.agg(collect_list(col("sk")).as("sks"))
        .select(expr("aggregate(slice(sks, 2, size(sks) - 1), sks[0], " +
          "(acc, x) -> kll_sketch_merge_double(acc, x))").as("sk"))
        .head().getAs[Array[Byte]](0)
      val groups = li.collect().map(r =>
        (r.getString(0), r.getDouble(1))).groupBy(_._1)
        .map { case (g, rs) => g -> rs.map(_._2).sorted }
      val global = groups.values.flatten.toArray.sorted
      def rankOf(vals: Array[Double], v: Double): Double =
        vals.count(_ <= v).toDouble / vals.length
      def estimates(sk: Array[Byte]): Seq[Double] = {
        import spark.implicits._
        Seq(sk).toDF("sk").select(probes.map(p =>
          expr(s"kll_sketch_get_quantile_double(sk, $p)")): _*)
          .head().toSeq.map(_.asInstanceOf[Double])
      }
      var worst = 0.0
      for ((g, sk) <- sks; (p, est) <- probes.zip(estimates(sk))) {
        val err = math.abs(rankOf(groups(g).toArray, est) - p)
        // discrete CDF jump: an exact value's rank overshoots p by up
        // to the value's own mass — subtract the unavoidable part
        val jump = groups(g).count(_ == est).toDouble / groups(g).size
        val e = math.max(0.0, err - jump)
        worst = math.max(worst, e)
        assert(e <= bound, s"$label group $g p=$p est=$est rankErr=$err")
      }
      for ((p, est) <- probes.zip(estimates(mergedSk))) {
        val err = math.abs(rankOf(global, est) - p)
        val jump = global.count(_ == est).toDouble / global.length
        val e = math.max(0.0, err - jump)
        worst = math.max(worst, e)
        assert(e <= bound, s"$label merged p=$p est=$est rankErr=$err")
      }
      info(f"$label kll k=default: worst rank err (jump-adjusted)=" +
        f"$worst%.4f over ${probes.size} probes x ${sks.size} groups " +
        "+ merged")
    }
  }

  test("kmv contract: distinct / union-merge / intersection estimates " +
      "within their bounds on the source shingle vocabularies") {
    import graft.functions.{GraftFunctions, TextFunctions}
    GraftFunctions.register(spark)
    val k = 256
    val rsd = 1.0 / math.sqrt(k - 2.0) // ~6.3% at k=256
    for ((label, dir) <- dirs) {
      val docs = Tables.table(spark, dir, "documents")
      val toks = docs.select(col("source"),
        explode(TextFunctions.hashedShingleSet(col("text"), 3)).as("tok"))
      val sk = Sketches.kmvSketches(toks, col("source"), col("tok"), k)
        .localCheckpoint()
      // per-source distinct estimates vs exact
      val exact = toks.groupBy(col("source"))
        .agg(countDistinct(col("tok")).as("exact"))
        .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      var worstD = 0.0
      sk.select(col("grp"), GraftFunctions.kmvEstimate(col("sk"), k))
        .collect().foreach { r =>
          val e = math.abs(r.getDouble(1) - exact(r.getString(0))) /
            exact(r.getString(0))
          worstD = math.max(worstD, e)
          assert(e <= 4 * rsd, s"$label ${r.getString(0)}: relErr=$e")
        }
      // union-merged rollup vs exact global distinct
      val globalExact = toks.agg(countDistinct(col("tok")))
        .head().getLong(0).toDouble
      val merged = sk
        .agg(GraftFunctions.kmvUnionAgg(col("sk"), k).as("u"))
        .select(GraftFunctions.kmvEstimate(col("u"), k))
        .head().getDouble(0)
      val mErr = math.abs(merged - globalExact) / globalExact
      assert(mErr <= 4 * rsd,
        s"$label merged=$merged exact=$globalExact relErr=$mErr")
      // pairwise intersection estimates vs exact — absolute error
      // bounded by the UNION size (Jaccard σ ≤ 1/(2√k) over the union
      // sample) plus the union estimate's own rsd, 4σ'd
      val vocab = toks.distinct()
      val exactPairs = vocab.select(col("source").as("a"), col("tok"))
        .join(vocab.select(col("source").as("b"), col("tok")), Seq("tok"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getLong(2).toDouble).toMap
      var worstI = 0.0
      Sketches.kmvOverlapMatrix(sk, k).collect().foreach { r =>
        val key = (r.getString(0), r.getString(1))
        val ex = exactPairs.getOrElse(key, 0.0)
        val un = exact(key._1) + exact(key._2) - ex
        val bound = 4 * (un / (2 * math.sqrt(k.toDouble)) + rsd * ex)
        val err = math.abs(r.getDouble(2) - ex)
        worstI = math.max(worstI, if (un > 0) err / un else 0.0)
        assert(err <= bound,
          s"$label $key: est=${r.getDouble(2)} exact=$ex union=$un " +
            s"err=$err bound=$bound")
      }
      info(f"$label kmv k=$k: worst distinct relErr=$worstD%.4f, " +
        f"worst intersection err/union=$worstI%.4f " +
        f"(pairs=${exactPairs.size}, global exact=${globalExact.toLong})")
    }
  }
}
