package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** End-to-end training-corpus pipeline — the composition the individual
  * operators exist for: quality filter → near-duplicate removal
  * (MinHash pairs → connected components → keep cluster representative)
  * → benchmark decontamination → deterministic train/test split.
  *
  * Every stage is one of the library's oracle-checked operators, so the
  * WHOLE pipeline has a DuckDB twin (`p1_training_corpus`) — the final
  * corpus membership, per-document quality, and split assignment are all
  * engine-portable and reproducible run-over-run.
  *
  * Scale shape (100 TB): quality filtering is a narrow codegen'd
  * projection at the scan; dedup is the banded-LSH bucket join (never
  * all-pairs) plus a few label-propagation rounds over the tiny pair
  * graph; decontamination broadcasts the benchmark postings; the split
  * is a stateless hash filter. No stage shuffles the corpus more than
  * once, and the two anti joins are against id sets orders of magnitude
  * smaller than the corpus.
  */
object Pipelines {

  /** @param docs         training candidates (must have doc_id, lang, text)
    * @param bench        benchmark/eval documents to decontaminate against
    * @param qualityMin   keep docs with quality >= this ([[TextOps.qualityCol]])
    * @param minhash      near-dup pair parameters
    * @param contamN      n-gram width for contamination overlap
    * @param contamMin    drop a doc sharing >= this many distinct n-grams
    *                     with any benchmark doc
    * @param testFraction hash-stable test-split share
    * @return (doc_id, lang, quality, split) ordered by doc_id
    */
  def trainingCorpus(docs: DataFrame, bench: DataFrame,
                     qualityMin: Double,
                     minhash: Dedup.MinHashParams,
                     contamN: Int, contamMin: Long,
                     testFraction: Double): DataFrame = {
    GraftFunctions.register(docs.sparkSession)

    // Referenced three times (near-dup pairs, contamination, final keep):
    // materialize once instead of re-scanning + re-scoring the corpus per
    // reference — the staging table every production pipeline writes
    // between phases, in local-checkpoint form.
    val cand = docs
      .withColumn("quality", TextOps.qualityCol(col("text")))
      .filter(col("quality") >= qualityMin)
      .localCheckpoint()

    // near-dup removal: keep each cluster's representative (min id);
    // docs in no pair are untouched. Auto-selected clustering: a pipeline
    // entry point cannot assume its duplicate graph is shallow (template
    // families chain A~B~C... through mutation series), so label
    // propagation is only PROBED for a few rounds — the cheap fast path
    // for the common tiny-clique graphs — and deep graphs fall back to
    // star contraction (O(log n) rounds on any component shape).
    val pairs = Dedup.minHashNearDupPairs(cand, "doc_id", "text", minhash)
    val dupIds = Clustering.nearDupClustersAuto(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("doc_id"))

    val contaminatedIds = TextOps.contaminationPairs(
      cand, bench, "doc_id", "text", contamN, contamMin)
      .select(col("train_id").as("doc_id")).distinct()

    val kept = cand
      .join(dupIds, Seq("doc_id"), "left_anti")
      .join(contaminatedIds, Seq("doc_id"), "left_anti")

    Sampling.trainTestSplit(kept, "doc_id", testFraction)
      .select(col("doc_id"), col("lang"), col("quality"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** The incremental counterpart of [[trainingCorpus]]: ingest a NEW
    * batch against an existing corpus — exact-dup screen (Bloom +
    * anti-join verification of the maybe-set), near-dup screen (batch
    * bands against corpus bands; the corpus never self-joins), quality
    * floor, then the same hash-stable split. Every screen here is
    * per-batch-document independent (cross-corpus only), so the stages
    * commute and the DuckDB twin is three WHERE predicates — simpler
    * than p1's within-set clustering, and the reason an incremental
    * ingest is so much cheaper than re-deduping the union.
    *
    * Scale shape (100 TB corpus, small daily batch): the corpus
    * contributes one Bloom build (tiny shuffle), one keyed anti-join
    * probed only by the maybe-set, and one banded-LSH side capped per
    * bucket. Nothing in the plan joins corpus to corpus.
    *
    * @return (doc_id, lang, quality, split) of the accepted batch rows
    */
  def incrementalIngest(batch: DataFrame, corpus: DataFrame,
                        qualityMin: Double,
                        minhash: Dedup.MinHashParams,
                        testFraction: Double): DataFrame = {
    GraftFunctions.register(batch.sparkSession)

    val exactNew = Dedup.bloomIncrementalDedup(batch, corpus, col("text"))

    val nearDupIds = Dedup.minHashNearDupPairsIncremental(
      exactNew, corpus, "doc_id", "text", minhash)
      .select(col("batch_id").as("doc_id")).distinct()

    val kept = exactNew
      .join(nearDupIds, Seq("doc_id"), "left_anti")
      .withColumn("quality", TextOps.qualityCol(col("text")))
      .filter(col("quality") >= qualityMin)

    Sampling.trainTestSplit(kept, "doc_id", testFraction)
      .select(col("doc_id"), col("lang"), col("quality"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** The curation pipeline over the round's structural screens —
    * Gopher-rule keep → token-entropy floor → embedding-space benchmark
    * decontamination → hash-stable split. Complements [[trainingCorpus]]
    * (which screens by composite quality + near-dup clusters + n-gram
    * contamination): these screens are all per-document structural or
    * embedding-space signals, the modern curation recipe.
    *
    * Scale shape: the Gopher and entropy screens are shuffle-free narrow
    * projections (TokenRunStats kernel); the semantic screen broadcasts
    * the benchmark and reduces to a per-id max; the joins are id-set
    * semi-joins far smaller than the corpus; the split is stateless.
    *
    * @param docs           candidates (doc_id, text, …)
    * @param emb            embeddings keyed by vec_id == doc_id
    * @param benchIdBelow   vec_id < this are the benchmark stand-ins
    *                       (excluded from the corpus)
    * @param minNormEntropy keep docs with norm_entropy >= this
    * @param tau            semantic contamination cosine threshold
    * @param testFraction   hash-stable test-split share
    * @return (doc_id, norm_entropy, max_sim, split) ordered by doc_id
    */
  def curationCorpus(docs: DataFrame, emb: DataFrame, benchIdBelow: Long,
                     minNormEntropy: Double, tau: Double,
                     testFraction: Double): DataFrame = {
    GraftFunctions.register(docs.sparkSession)

    val structuralOk = TextOps.gopherRules(docs)
      .filter(col("keep") === 1L).select(col("doc_id"))
    val entropyOk = TextOps.tokenEntropy(docs)
      .filter(col("norm_entropy") >= minNormEntropy)
      .select(col("doc_id"), col("norm_entropy"))
    val semantic = Similarity.semanticContamination(
      emb.filter(col("vec_id") >= benchIdBelow),
      emb.filter(col("vec_id") < benchIdBelow)
        .select(col("embedding").as("bench_vec")),
      "vec_id", "embedding", "bench_vec", tau)
      .filter(col("contaminated") === 0L)
      .select(col("vec_id").as("doc_id"), col("max_sim"))

    val kept = structuralOk
      .join(entropyOk, Seq("doc_id"))
      .join(semantic, Seq("doc_id"))

    Sampling.trainTestSplit(kept, "doc_id", testFraction)
      .select(col("doc_id"), col("norm_entropy"), col("max_sim"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Leakage-safe train/test split: near-duplicate documents NEVER
    * straddle the split boundary. A plain per-document hash split (p1's
    * final stage) is correct after dedup removes the duplicates; when a
    * pipeline keeps all copies (multi-epoch corpora, provenance-preserving
    * curation, ablation studies), hashing each doc_id independently puts
    * ~2·f·(1−f) of every near-dup pair across the boundary — the classic
    * eval-leakage bug where the model is scored on paraphrases of its own
    * training data.
    *
    * Fix: hash the near-dup CLUSTER, not the document. Banded-LSH pairs →
    * connected components (auto-selected clustering, same as p1) → each
    * doc keyed by its cluster representative (its own id when it is in no
    * pair) → the standard hash-stable bucket rule on that key. Members of
    * a cluster share the key, so they land on the same side by
    * construction; singletons reduce to the plain split.
    *
    * Scale shape (100 TB): the pair graph and cluster map are orders of
    * magnitude smaller than the corpus (only docs occurring in some pair),
    * so the corpus-side cost is ONE left join against the cluster map —
    * broadcastable in the common case, AQE-planned otherwise — and the
    * stateless bucket projection. The corpus shuffles at most once.
    *
    * @return (doc_id, cluster, split) ordered by doc_id; `cluster` is the
    *         split key (component min id, or the doc's own id)
    */
  /** KMV-gated decontamination — the a6 sizing sketch wired into the
    * scheduling decision it exists for: estimate |train-vocabulary ∩
    * benchmark-vocabulary| from two O(k)-long synopses (one scan per
    * side, map-side partials carry ≤ k longs) and run the full
    * contamination join ONLY when the estimated shared-shingle count
    * clears `minOverlapEst`. At 100 TB the corpus synopsis is built
    * once (or maintained beside the corpus) and every new benchmark
    * costs O(k) driver work to size — the "is this decontamination
    * pass worth scheduling" answer without touching corpus bytes.
    *
    * The gate is a SCHEDULING decision, not a correctness filter: the
    * KMV estimate carries ~|A∪B|/(2√k) absolute error (see
    * [[graft.functions.KmvOps]]), so callers set `minOverlapEst` well
    * below the overlap that would make the join worthwhile (the
    * default 0 runs the join whenever the synopses share ANY minima —
    * vocabulary-disjoint benchmarks skip, anything plausibly
    * overlapping runs). On the kept path the result is EXACTLY
    * [[TextOps.contaminationPairs]] — bit-identical, oracle unchanged.
    *
    * @return (gateFired, pairs) — pairs is an empty frame with the
    *         contract schema when the gate skips the join
    */
  def gatedContamination(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         n: Int, minShared: Long,
                         k: Int = 256, minOverlapEst: Double = 0.0)
      : (Boolean, DataFrame) = {
    GraftFunctions.register(train.sparkSession)
    import graft.functions.TextFunctions.hashedShingleSet
    def synopsis(df: DataFrame) = df
      .select(explode(hashedShingleSet(col(textCol), n)).as("tok"))
      .agg(GraftFunctions.kmvAgg(xxhash64(col("tok")), k).as("sk"))
    val est = synopsis(train).select(col("sk").as("sk_a"))
      .crossJoin(broadcast(synopsis(bench).select(col("sk").as("sk_b"))))
      .select(GraftFunctions.kmvIntersect(col("sk_a"), col("sk_b"), k)
        .as("est"))
      .head().getDouble(0)
    if (est <= minOverlapEst)
      (false, TextOps.contaminationPairs(train.limit(0), bench.limit(0),
        idCol, textCol, n, minShared))
    else
      (true, TextOps.contaminationPairs(train, bench, idCol, textCol,
        n, minShared))
  }

  def leakageSafeSplit(docs: DataFrame,
                       minhash: Dedup.MinHashParams,
                       testFraction: Double): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", minhash)
    val clusters = Clustering.nearDupClustersAuto(pairs)
      .withColumnRenamed("id", "doc_id")
    val keyed = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    Sampling.trainTestSplit(keyed, "cluster", testFraction)
      .select(col("doc_id"), col("cluster"), col("split"))
      .orderBy(col("doc_id"))
  }
}
