package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Deterministic, key-stable sampling and splitting for training-data
  * pipelines.
  *
  * `rand()`-based sampling is useless for a reproducible corpus: it
  * changes under retries, repartitions, and engine versions, and it
  * cannot assign the SAME document to the same split across pipeline
  * runs. Hash-based bucketing fixes all of that — the bucket is a pure
  * function of the key, so samples are stable, splits are disjoint and
  * exhaustive, any engine reproduces them (the DuckDB oracle runs the
  * same formula), and at 100 TB it is a narrow codegen'd filter with
  * zero shuffle and zero RNG state.
  *
  * Bucket = mix3(polyfold(key-as-string)) mod `buckets`, where polyfold
  * is the portable polynomial hash and each mix round is
  * `x -> (xor(x, x >> 13) * 1021 + 12345) mod 1e9+7`. The xor-shift is
  * load-bearing: a purely affine round is a LINEAR map, so consecutive
  * numeric keys keep a constant stride modulo the bucket count and a
  * "sample" degenerates into contiguous id runs (caught by spec —
  * max run 20 affine vs 5 with the xor). All steps are 64-bit-safe
  * integer ops any ANSI engine reproduces.
  */
object Sampling {

  /** Number of hash buckets: fractions are resolved at 0.01% granularity. */
  val Buckets = 10000

  /** Mixer rounds (each: xor-shift then affine, mod [[TextFunctions.FpPrime]]). */
  val MixRounds = 3

  /** Full-resolution mixed hash in [0, FpPrime) — the value behind
    * [[hashBucket]]. */
  private[graft] def hashMixed(key: Column): Column = {
    val h0 = TextFunctions.charFingerprint(key.cast("string"))
    (0 until MixRounds).foldLeft(h0)((h, _) =>
      (h.bitwiseXOR(shiftright(h, 13)) * lit(1021L) + lit(12345L))
        % lit(TextFunctions.FpPrime))
  }

  /** Stable bucket in [0, Buckets) for a key column. */
  def hashBucket(key: Column): Column =
    pmod(hashMixed(key), lit(Buckets.toLong))

  /** Keep rows whose key hashes into the first `fraction` of buckets.
    * Same key → same decision, on every run and every engine.
    */
  /** Bucket threshold for a fraction — rounded, not truncated: e.g.
    * 0.29 * 10000 is 2899.9999... in double and would silently keep one
    * bucket fewer under toLong.
    */
  def bucketThreshold(fraction: Double): Long = math.round(fraction * Buckets)

  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    GraftFunctions.register(df.sparkSession)
    df.filter(hashBucket(col(keyCol)) < bucketThreshold(fraction))
  }

  /** Stratified hash sampling: per-stratum keep fractions (e.g. downsample
    * dominant languages, keep all of a rare one). Same determinism
    * contract as [[sampleByHash]] — the decision is a pure function of
    * (key, stratum), so re-runs and engines agree row for row. Strata
    * absent from `fractions` use `defaultFraction`.
    *
    * At 100 TB this is still a narrow, shuffle-free codegen'd filter:
    * the stratum column only selects which threshold the key's bucket is
    * compared against.
    */
  def stratifiedSampleByHash(df: DataFrame, keyCol: String, strataCol: String,
                             fractions: Map[String, Double],
                             defaultFraction: Double): DataFrame = {
    (defaultFraction +: fractions.values.toSeq).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction out of [0,1]: $f"))
    GraftFunctions.register(df.sparkSession)
    val threshold = fractions.foldLeft(lit(bucketThreshold(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(bucketThreshold(f))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /** Temperature-weighted corpus mixing: resample each stratum (domain,
    * language, source) at a rate derived from its size so the output
    * follows the α-temperature distribution used for multilingual /
    * multi-domain LM training mixes — α = 1 keeps natural proportions,
    * α = 0 equalizes strata, in between up-weights the tail without
    * drowning the head.
    *
    * rate_d = min(1, targetFrac · N · c_d^α / (Σ_e c_e^α) / c_d), applied
    * through the same portable hash-bucket filter as [[sampleByHash]] —
    * the keep decision stays a pure function of (key, stratum counts), so
    * re-runs and engines agree row for row, and the oracle recomputes the
    * rates from the same counts.
    *
    * Scale shape: one tiny per-stratum count aggregation (decomposable),
    * one single-row total, then a broadcast join of the per-stratum
    * thresholds onto the corpus — the corpus itself is never shuffled,
    * just scanned through a codegen'd filter.
    */
  /** Per-stratum α-temperature sampling rate, shared by [[temperatureMix]]
    * and [[temperatureMixEpochs]]: one frame (strataCol, __rate) with
    * rate_d = targetFrac · N · c_d^α / (Σ_e c_e^α) / c_d. The expression
    * tree (and thus FP evaluation order) must stay in lockstep with the
    * q41/q48 oracle SQL — this helper is the single place it lives.
    */
  private def strataRates(df: DataFrame, strataCol: String,
                          alpha: Double, targetFrac: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of [0,1]: $alpha")
    require(targetFrac > 0.0, s"targetFrac must be positive: $targetFrac")
    val cnt = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("__c"))
    val tot = cnt.agg(sum(pow(col("__c"), lit(alpha))).as("__sw"),
      sum(col("__c")).as("__n"))
    cnt.crossJoin(broadcast(tot))
      .withColumn("__rate",
        lit(targetFrac) * col("__n") * pow(col("__c"), lit(alpha)) /
          col("__sw") / col("__c"))
      .select(col(strataCol), col("__rate"))
  }

  def temperatureMix(df: DataFrame, keyCol: String, strataCol: String,
                     alpha: Double, targetFrac: Double): DataFrame = {
    require(targetFrac <= 1.0, s"targetFrac out of (0,1]: $targetFrac")
    GraftFunctions.register(df.sparkSession)
    val thresholds = strataRates(df, strataCol, alpha, targetFrac)
      .select(col(strataCol),
        floor(least(lit(1.0), col("__rate")) * lit(Buckets.toDouble) + lit(0.5))
          .cast("long").as("__thr"))
    df.join(broadcast(thresholds), strataCol)
      .filter(hashBucket(col(keyCol)) < col("__thr"))
      .drop("__thr")
  }

  /** [[temperatureMix]] with repetition: when a stratum's α-temperature
    * target EXCEEDS its size, rows repeat (the "epochs > 1 for rare
    * domains" trick of LM data mixtures) instead of capping at full
    * retention. Every row gets `floor(rate)` copies plus one more when
    * its hash bucket falls under the fractional part — so expected
    * per-stratum output hits the target exactly, each key's copy count
    * is a pure function of (key, stratum counts), and the oracle
    * recomputes it. Output carries `rep` (1-based copy index) so
    * downstream shuffles can spread copies.
    *
    * Scale shape: identical to [[temperatureMix]] (two tiny aggregations
    * + broadcast thresholds) plus a bounded `sequence` explode — fan-out
    * is the repetition factor, never unbounded.
    */
  def temperatureMixEpochs(df: DataFrame, keyCol: String, strataCol: String,
                           alpha: Double, targetFrac: Double): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val rates = strataRates(df, strataCol, alpha, targetFrac)
      .select(col(strataCol),
        floor(col("__rate")).cast("long").as("__base"),
        floor((col("__rate") - floor(col("__rate"))) * lit(Buckets.toDouble)
          + lit(0.5)).cast("long").as("__fthr"))
    df.join(broadcast(rates), strataCol)
      .withColumn("__copies", col("__base") +
        when(hashBucket(col(keyCol)) < col("__fthr"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("rep", explode(sequence(lit(1L), col("__copies"))))
      .drop("__base", "__fthr", "__copies")
  }

  /** Deterministic weighted sampling WITHOUT replacement, k per stratum
    * (Efraimidis–Spirakis A-Res with hash-derived uniforms): each row
    * draws `u = (bucket(key) + 0.5) / Buckets` ∈ (0,1) from the portable
    * hash and ranks by `ln(u) / w` descending — the top k per stratum are
    * exactly a weighted sample without replacement, where a row's
    * inclusion odds scale with its weight. No RNG state: the draw is a
    * pure function of the key, so re-runs, retries, and engines agree.
    *
    * The rank key is rounded half-up at 1e-9 BEFORE ranking (ties then
    * break on the key column ascending) so a last-ulp `ln` difference
    * between libms can never flip a rank across engines.
    *
    * Rows with non-positive weight are excluded (they have zero selection
    * mass; `ln(u)/w` would flip sign).
    *
    * Scale shape: narrow codegen'd scoring (zero shuffle), then the
    * bounded [[graft.functions.TopKAggregate]] per stratum — each map
    * task reduces to ≤ k candidates per stratum BEFORE the exchange, so
    * the shuffle carries O(k · partitions) rows, never the corpus. A
    * window `row_number` formulation would shuffle every row.
    *
    * `keyCol` must be long-typed (it rides through the top-k aggregate's
    * id slot). Output: (stratum, rk, key, skey) ordered (stratum, rk).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     strataCol: String, k: Int): DataFrame = {
    require(k > 0)
    GraftFunctions.register(df.sparkSession)
    val u = (hashBucket(col(keyCol)).cast("double") + lit(0.5)) /
      lit(Buckets.toDouble)
    val scored = df.filter(col(weightCol) > 0)
      .select(col(strataCol),
        TextFunctions.roundHalfUp(
          log(u) / col(weightCol).cast("double"), 9).as("skey"),
        col(keyCol))
    scored.groupBy(col(strataCol))
      .agg(GraftFunctions.topK(col("skey"), col(keyCol), k).as("tk"))
      .select(col(strataCol), posexplode(col("tk")))
      .select(col(strataCol), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as(keyCol), col("col.score").as("skey"))
      .orderBy(col(strataCol), col("rk"))
  }

  /** Per-group cap (the "domain cap" of crawl curation: at most `k`
    * documents per source/host, so no single domain dominates the mix).
    * Which k survive is deterministic and content-blind-fair: rows are
    * taken in (hash-bucket, key) order — a stable pseudo-random order that
    * re-runs and engines reproduce, unlike "first k seen" (partition-order
    * nondeterminism) or `rand()` ordering.
    *
    * Scale shape: the same bounded top-k aggregate as [[weightedSample]]
    * — map-side partials carry <= k rows per group, the shuffle never
    * carries a hot domain's full posting. `keyCol` must be long-typed.
    * Output: (group, rk, key, bucket) ordered (group, rk).
    */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String,
                  k: Int): DataFrame = {
    require(k > 0)
    GraftFunctions.register(df.sparkSession)
    // score = -bucket (top-k keeps score DESC = bucket ASC, ties id ASC)
    df.select(col(groupCol), col(keyCol),
        hashBucket(col(keyCol)).as("__bkt"))
      .groupBy(col(groupCol))
      .agg(GraftFunctions.topK(-col("__bkt").cast("double"), col(keyCol), k)
        .as("tk"))
      .select(col(groupCol), posexplode(col("tk")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as(keyCol),
        (-col("col.score")).cast("long").as("bucket"))
      .orderBy(col(groupCol), col("rk"))
  }

  /** Adds a `split` column: "test" for the first `testFraction` of
    * buckets, "train" otherwise. Disjoint and exhaustive by construction;
    * a document can never leak between splits across runs.
    */
  def trainTestSplit(df: DataFrame, keyCol: String,
                     testFraction: Double): DataFrame = {
    require(testFraction >= 0.0 && testFraction <= 1.0)
    GraftFunctions.register(df.sparkSession)
    df.withColumn("split",
      when(hashBucket(col(keyCol)) < bucketThreshold(testFraction),
        lit("test")).otherwise(lit("train")))
  }

  /** Quality-stratified mixing: rows rank into `rates.length` equal-size
    * quality bins (ntile over the TOTAL (score, key) order; the last bin
    * is the best) and each bin keeps its own hash-stable fraction — the
    * "keep the top decile, thin the tail" curation mix, orthogonal to
    * the domain-temperature mix of [[temperatureMix]].
    *
    * Scale note: ntile is a global sort. At corpus scale, swap the bin
    * assignment for broadcast quantile BOUNDARIES (compose
    * [[Percentiles.exactPercentilesRanged]] or a sketch) — the keep
    * logic is unchanged. The ntile formulation is kept on the query
    * surface because it is engine-exact (a deterministic total order
    * yields identical bins in the DuckDB oracle), which is what the
    * correctness gate needs.
    *
    * Output schema = input + `bin` (1-based quality bin, kept for
    * downstream stratification); an input that already carries a `bin`
    * column is refused rather than silently overwritten.
    *
    * @param rates keep fraction per bin, ascending quality order
    */
  def qualityBinMix(df: DataFrame, keyCol: String, scoreCol: String,
                    rates: Seq[Double]): DataFrame = {
    require(rates.nonEmpty && rates.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must all be in [0,1]: $rates")
    require(!df.columns.contains("bin"),
      "qualityBinMix adds a 'bin' column; the input already has one")
    GraftFunctions.register(df.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol), col(keyCol))
    val thr = rates.zipWithIndex.foldLeft(lit(-1L)) { case (acc, (r, i)) =>
      when(col("bin") === (i + 1), lit(bucketThreshold(r))).otherwise(acc)
    }
    df.withColumn("bin", ntile(rates.length).over(w).cast("long"))
      .filter(hashBucket(col(keyCol)) < thr)
  }

  /** Two-pass, boundary-broadcast twin of [[qualityBinMix]] — the corpus-
    * scale formulation promised in its scale note, returning BIT-IDENTICAL
    * results (same bins, same kept rows, same oracle).
    *
    * Instead of one global ntile sort, pass 1 extracts the (score, key)
    * PAIRS sitting at ntile's cutoff ranks using distributed order
    * statistics: one `repartitionByRange` exchange of narrow pairs, a
    * parallel per-partition sort, per-partition sizes cumulated into
    * global offsets (tiny driver step), then each partition emits only
    * the rows whose global rank is a cutoff — `bins - 1` rows total.
    * Pair-valued boundaries (not value-only) are what make this EXACTLY
    * ntile: ties on the score are ordered by key on both sides of the
    * comparison, so a boundary never splits differently than the window
    * formulation.
    *
    * Pass 2 is a stateless codegen'd projection: bin(x) = 1 + #{boundary
    * < (score, key)} over the broadcast literals, then the same per-bin
    * hash-keep filter. At 100 TB pass 1 shuffles ~16 bytes/row once and
    * pass 2 is shuffle-free — no stage ever sorts the corpus globally.
    */
  def qualityBinMixBoundaries(df: DataFrame, keyCol: String, scoreCol: String,
                              rates: Seq[Double]): DataFrame = {
    import org.apache.spark.TaskContext
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(rates.nonEmpty && rates.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must all be in [0,1]: $rates")
    require(!df.columns.contains("bin"),
      "qualityBinMixBoundaries adds a 'bin' column; the input already has one")
    GraftFunctions.register(df.sparkSession)
    val b = rates.length

    val pairs = df.select(col(scoreCol).as("__s"), col(keyCol).as("__k"))
    // Materialize the range-partitioned pairs ONCE: pass 1 runs two
    // actions over them (sizes, then boundary rows); without the
    // checkpoint each action re-scores and re-exchanges the corpus.
    // Narrow rows (~16 bytes each). Measured honestly: at sf0.1 this is
    // a small win (1.98 s -> 1.85 s) because the dominant toy-scale cost
    // is scoring `df` in pass 2 anyway — the structural payoff is at
    // corpus scale, where the avoided recompute is a full score+exchange
    // of the corpus and the avoided ntile sort is single-partition.
    val ranged = pairs
      .repartitionByRange(col("__s"), col("__k"))
      .sortWithinPartitions(col("__s"), col("__k"))
      .localCheckpoint()
    val sizeSchema = StructType(Seq(StructField("pid", LongType, false),
      StructField("n", LongType, false)))
    val sizes = ranged.mapPartitions { it =>
      Iterator.single(Row(
        TaskContext.getPartitionId().toLong,
        it.map(_ => 1L).sum))
    }(Encoders.row(sizeSchema))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = sizes.values.sum
    // ntile's cumulative bin sizes: the first (n mod b) bins are one
    // bigger. cuts(i) = last rank of bin i+1; boundary pairs sit AT those
    // ranks. Duplicate cut ranks (more bins than rows) keep their
    // multiplicity in the fold below — exactly ntile's degenerate split.
    val cuts = (1 until b).map(i => i.toLong * (n / b) + math.min(i.toLong, n % b))
      .filter(_ > 0)
    val rankSet = cuts.toSet
    val offsets = {
      val nParts = sizes.keys.foldLeft(-1L)(math.max) + 1
      val off = collection.mutable.Map[Long, Long]()
      var acc = 0L
      (0L until nParts).foreach { pid =>
        off(pid) = acc
        acc += sizes.getOrElse(pid, 0L)
      }
      off.toMap
    }
    val bSchema = StructType(pairs.schema.fields :+
      StructField("__rank", LongType, nullable = false))
    val rankToPair = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      var r = offsets(pid)
      it.flatMap { row =>
        r += 1
        if (rankSet.contains(r)) Some(Row(row.get(0), row.get(1), r))
        else None
      }
    }(Encoders.row(bSchema))
      .collect().map(r => r.getLong(2) -> (r.get(0), r.get(1))).toMap
    // Both passes over the ranged pairs are done and the result plan
    // below scores `df` directly — release the checkpoint blocks now
    // instead of leaking them for the session lifetime (Dataset.unpersist
    // would silently no-op on a checkpointed frame; see Checkpoints).
    graft.plans.Checkpoints.free(ranged)

    val pairCol = struct(col(scoreCol).as("s"), col(keyCol).cast(
      df.schema(keyCol).dataType).as("k"))
    // bin = 1 + #{boundary < pair}, two regimes by bin count:
    //  - <= 32 cuts: a flat SUM of when(...) indicators — fully codegen'd
    //    (whole-stage), the fast path for real decile/percentile mixes.
    //    (A size(filter(<literal array>, ...)) formulation was measured
    //    3.8x SLOWER here at 10 bins/sf0.1: higher-order-function lambdas
    //    evaluate interpreted, per element, per row.)
    //  - above 32: the literal-boundary-array filter — O(bins) interpreted
    //    work per row, but constant expression depth, where the indicator
    //    sum's growing codegen (and Janino method size) is the real
    //    hazard. Both regimes share the same struct comparison, so the
    //    tie-exact pair semantics are bit-identical (ntile parity
    //    spec-pinned at 5 and 100 bins).
    def boundaryLit(cut: Long) = {
      val (bs, bk) = rankToPair(cut)
      struct(lit(bs).cast(df.schema(scoreCol).dataType).as("s"),
        lit(bk).cast(df.schema(keyCol).dataType).as("k"))
    }
    val binExpr =
      if (cuts.isEmpty) lit(1L)
      else if (cuts.length <= 32)
        cuts.map(c => when(pairCol > boundaryLit(c), 1L).otherwise(0L))
          .reduce(_ + _) + lit(1L)
      else
        lit(1L) + size(filter(array(cuts.map(boundaryLit): _*),
          bnd => (pairCol > bnd))).cast("long")
    // Literal lookup array instead of a nested when-chain: one bounded
    // element_at per row however many bins there are (bin is 1-based and
    // provably in [1, b] — binExpr is 1 + a sum of b-1 indicators).
    val thr = element_at(
      array(rates.map(r => lit(bucketThreshold(r))): _*),
      col("bin").cast("int"))
    df.withColumn("bin", binExpr)
      .filter(hashBucket(col(keyCol)) < thr)
  }

  // ---- DSIR: data selection via importance resampling ----
  //
  // Xie et al., "Data Selection for Language Models via Importance
  // Resampling" (NeurIPS 2023): featurize documents as hashed word
  // unigram + bigram counts folded into a bounded bucket vector, fit the
  // target and raw bucket distributions, weight each document by the sum
  // of its features' log-likelihood ratios, and select by Gumbel top-k
  // over the weights (importance resampling, not argmax).
  //
  // Spark shape at 100 TB:
  //  - fit: ONE corpus scan; the per-bucket counts partial-aggregate
  //    map-side, so the shuffle is O(partitions x buckets) — corpus-size-
  //    independent — and the collected model is O(buckets), a few KB.
  //  - score: ONE shuffle-free codegen'd map pass — the log-ratio vector
  //    rides into the generated code as a LITERAL array
  //    ([[graft.functions.BucketWeightSum]]); no join against a feature
  //    table, no per-row allocation.
  //  - select: deterministic hash-Gumbel keys (RNG-free and key-stable,
  //    the [[sampleByHash]] contract) + a bounded TakeOrdered top-k. For
  //    fraction-scale selection at 10^10 docs, threshold `dsir_key` at an
  //    approx quantile instead of ranking — the key column is already
  //    computed, so the selection stays one filter.
  //
  // Cross-engine determinism: log-ratios are half-up rounded at 9 dp,
  // scores and keys at 6 dp, and the score sums features in list order —
  // the oracle's ordered list_reduce over the same rounded doubles is
  // bit-identical.

  /** The fitted importance model: `logRatios(b)` = 9-dp-rounded
    * ln(p_target(b)) - ln(p_raw(b)) under Laplace smoothing. */
  final case class DsirModel(buckets: Int, logRatios: Array[Double])

  /** Hashed unigram + bigram feature list of a text column (duplicates
    * kept — DSIR weights repeated n-grams), in deterministic order:
    * unigram token hashes first, then rolling bigram folds. */
  private def dsirFeatures(text: Column): Column =
    concat(TextFunctions.tokenHashes(text),
      TextFunctions.windowHashes(text, 2))

  /** Signed cross-engine half-up rounding (toward +inf at ties):
    * floor(x * 10^n + 0.5) / 10^n — [[TextFunctions.roundHalfUp]]'s
    * contract extended to negative values (importance weights are
    * signed). */
  private def roundSigned(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Fit the DSIR importance model in one corpus scan. `targetPred`
    * marks the in-domain rows (the target sample lives IN the corpus —
    * a trusted source, a language, a quality gate); the raw distribution
    * is the whole corpus. The grouped bucket counts partial-aggregate
    * map-side and the collect is bounded by `buckets`.
    */
  def dsirFit(docs: DataFrame, textCol: String, targetPred: Column,
              buckets: Int = 4096): DsirModel = {
    require(buckets > 0, "buckets must be positive")
    GraftFunctions.register(docs.sparkSession)
    val rows = docs
      .select(explode(dsirFeatures(col(textCol))).as("h"),
        targetPred.cast("boolean").as("__tgt"))
      .groupBy(pmod(col("h"), lit(buckets.toLong)).as("b"))
      .agg(count(lit(1)).as("raw"), count(when(col("__tgt"), 1)).as("tgt"))
      .collect()
    val raw = new Array[Long](buckets)
    val tgt = new Array[Long](buckets)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      raw(b) = r.getLong(1); tgt(b) = r.getLong(2)
    }
    val rawTot = raw.sum.toDouble
    val tgtTot = tgt.sum.toDouble
    val lr = Array.tabulate(buckets) { b =>
      val v = math.log((tgt(b) + 1.0) / (tgtTot + buckets)) -
        math.log((raw(b) + 1.0) / (rawTot + buckets))
      math.floor(v * 1e9 + 0.5) / 1e9
    }
    DsirModel(buckets, lr)
  }

  /** Add `dsir_score` (6-dp-rounded importance weight) — the shuffle-free
    * codegen'd scoring pass over a fitted model. */
  def dsirScored(docs: DataFrame, textCol: String,
                 model: DsirModel): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.withColumn("dsir_score",
      roundSigned(GraftFunctions.bucketScore(dsirFeatures(col(textCol)),
        lit(model.logRatios)), 6))
  }

  /** Gumbel-top-k importance resample: fit + score + select the `k`
    * documents with the largest `dsir_score + Gumbel(hash(id))`. The
    * Gumbel perturbation makes the selection a weighted sample without
    * replacement (softmax over weights) rather than a deterministic
    * argmax — DSIR's diversity argument — while staying RNG-free:
    * u = (hashBucket(id) + 0.5) / Buckets, g = -ln(-ln(u)); the same
    * document gets the same key on every run and every engine.
    * Output carries `dsir_score` and the 6-dp `dsir_key`.
    */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
                   targetPred: Column, k: Int,
                   buckets: Int = 4096): DataFrame = {
    require(k > 0, "k must be positive")
    val model = dsirFit(docs, textCol, targetPred, buckets)
    // bucket-resolution uniform, the same convention as weightedSampleARes:
    // u = (bucket + 0.5) / Buckets, never 0 or 1, so the Gumbel is finite
    val u = (hashBucket(col(idCol)) + lit(0.5)) / lit(Buckets.toDouble)
    dsirScored(docs, textCol, model)
      .withColumn("dsir_key",
        roundSigned(col("dsir_score") - log(-log(u)), 6))
      .orderBy(col("dsir_key").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic GLOBAL SHUFFLE into fixed training shards — the last
    * stage of a corpus build: dataloaders want the corpus in random
    * order, split into equal-ish shard files, and the shuffle must be
    * reproducible (retries, re-runs, and engines all agree) — which
    * rules out `rand()` exactly as the scaladoc above argues for
    * sampling. Both decisions are pure functions of the key:
    * `shard = hashMixed(key:salt) mod shards`, within-shard order =
    * `hashMixed(key;salt)` — stored as `ord`, so every shard is
    * self-describing (a reader can verify or re-establish the order
    * from the data alone, and the DuckDB oracle checks the whole
    * permutation, not just membership). A new `salt` is a fresh
    * independent permutation (epoch reshuffles without rewriting logic).
    *
    * Execution shape: ONE shuffle (repartition on the shard id — each
    * task holds whole shards) + a per-task sort on `ord`, then a
    * `partitionBy(shard)` write that emits one file per shard in `ord`
    * order (a task holding several shards writes each file as the
    * ord-sorted subsequence — a filter of a sorted run is sorted). At
    * 100 TB: pick `shards` ≈ corpus/shard-file-size; sort cost is
    * per-shard, never global.
    */
  def writeTrainingShards(df: DataFrame, path: String, keyCol: String,
                          shards: Int, salt: String = ""): Unit = {
    require(shards > 0, s"shards must be positive: $shards")
    GraftFunctions.register(df.sparkSession)
    val skey = concat(col(keyCol).cast("string"), lit(":" + salt))
    val okey = concat(col(keyCol).cast("string"), lit(";" + salt))
    df.withColumn("shard",
        pmod(hashMixed(skey), lit(shards.toLong)).cast("int"))
      .withColumn("ord", hashMixed(okey))
      // the sort MUST lead with the partition column: FileFormatWriter
      // requires task rows ordered by the partitionBy columns and
      // inserts its OWN sort (by shard alone — scrambling ord) when the
      // incoming order doesn't already satisfy it
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

}
