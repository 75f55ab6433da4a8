package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for training-data pipelines (north-star tier,
  * SURVEY.md §2.3): token counting, quality scoring, heuristic language ID,
  * document fingerprinting, n-gram statistics.
  *
  * All per-document ops are narrow (no shuffle) and codegen-friendly; the
  * n-gram frequency op is one explode + one hash aggregation, with map-side
  * partial counts. Every formula is mirrored 1:1 by an ANSI-SQL oracle twin
  * in `SparkEntry.oracleSql`.
  */
object TextOps {

  /** Regex-token pattern (BPE-ish: word pieces or single punctuation). */
  val TokenRegex = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  /** Unicode-normalize a text column ahead of the shingle-based dedup
    * family ([[Dedup.minHashNearDupPairs]], [[Dedup.writeSignatureIndex]],
    * fingerprints, SimHash): NFC canonical composition (codegen'd JDK
    * kernel, [[graft.functions.NfcNormalize]]), optional Unicode
    * case-fold and whitespace collapse. Two canonically-equivalent
    * encodings of the same text hash to DIFFERENT shingles, so an NFD
    * copy of an NFC document reads as "novel" to every byte-level dedup
    * op — compose this into the text column first
    * (`df.withColumn("text", normalizeText(col("text")))`) and the
    * variants collide exactly. A narrow, shuffle-free projection; the
    * all-ASCII fast path returns the input untouched, so composing it
    * unconditionally costs one normalization check per row at 100 TB.
    */
  def normalizeText(text: Column, caseFold: Boolean = false,
                    collapseWhitespace: Boolean = false): Column = {
    val nfc = graft.functions.GraftFunctions.nfcNormalize(text)
    val cased = if (caseFold) lower(nfc) else nfc
    if (collapseWhitespace) trim(regexp_replace(cased, "\\s+", " "))
    else cased
  }

  /** Per-doc token counts: whitespace tokens + regex tokens. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      regexp_count(col("text"), lit(TokenRegex)).as("n_re_tokens"))
      .orderBy(col("doc_id"))

  /** Heuristic quality score in [0,1]:
    * 0.3 · min(tokens/100, 1) + 0.4 · stopword-ratio + 0.3 · min(meanWordLen/8, 1).
    * Components are exposed (rounded) for inspection; the score is computed
    * from the unrounded components.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    withQuality(docs).orderBy(col("doc_id"))

  /** The quality-formula components of a text column — the SINGLE source
    * of the formula: [[qualityCol]], [[withQuality]], and therefore every
    * pipeline filter and the DuckDB oracle derive from this one builder.
    */
  private def qualityParts(text: Column):
      (Column, Column, Column, Column) = {
    val tok = tokens(text)
    val nTok = size(tok).cast("double")
    val sumLen = aggregate(transform(tok, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double")
    val avgWlen = when(nTok > 0, sumLen / nTok).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0,
      stopwordHits(tok, langStopwords.head._2).cast("double") / nTok)
      .otherwise(lit(0.0))
    val score = lit(0.3) * least(nTok / lit(100.0), lit(1.0)) +
      lit(0.4) * stopRatio +
      lit(0.3) * least(avgWlen / lit(8.0), lit(1.0))
    (nTok, avgWlen, stopRatio, score)
  }

  /** Composite quality score of a text column, rounded half-up at 6 dp. */
  def qualityCol(text: Column): Column =
    roundHalfUp(qualityParts(text)._4, 6)

  /** Unsorted [[qualityScore]] core — usable on STREAMING DataFrames too
    * (a global sort is illegal on an unbounded stream); the narrow
    * projection composes with `readStream` → filter → sink for the
    * classic "drop low-quality docs at ingest" pipeline (spec-tested in
    * `StreamOpsSpec`).
    */
  def withQuality(docs: DataFrame): DataFrame = {
    val (nTok, avgWlen, stopRatio, score) = qualityParts(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      nTok.cast("long").as("n_tokens"),
      roundHalfUp(avgWlen, 6).as("avg_word_len"),
      roundHalfUp(stopRatio, 6).as("stopword_ratio"),
      roundHalfUp(score, 6).as("quality"))
  }

  /** Heuristic language ID: stopword-profile hit counts per language,
    * argmax with a fixed deterministic tie-break order (en,fr,es,de,zh);
    * all-zero → "und". Output keeps the per-language counts and a flag
    * against the labeled `lang` column when present.
    */
  def langId(docs: DataFrame): DataFrame = {
    val tok = tokens(col("text"))
    val hits: Seq[(String, Column)] =
      langStopwords.map { case (l, words) => l -> stopwordHits(tok, words) }
    val hitCols = hits.map { case (l, c) => c.as(s"hits_$l") }
    val base = docs.select((col("doc_id") +: col("lang") +: hitCols): _*)

    def h(l: String) = col(s"hits_$l")
    val allZero = hits.map(_._1).map(l => h(l) === 0).reduce(_ && _)
    // argmax chain with fixed priority: en >= max(rest) → en, else fr >= ...
    val langs = langStopwords.map(_._1)
    def chain(rest: List[String]): Column = rest match {
      case l :: Nil => lit(l)
      case l :: tail =>
        val maxRest =
          if (tail.size == 1) h(tail.head) else greatest(tail.map(h): _*)
        when(h(l) >= maxRest, lit(l)).otherwise(chain(tail))
      case Nil => lit("und")
    }
    base
      .withColumn("lang_guess",
        when(allZero, lit("und")).otherwise(chain(langs.toList)))
      .withColumn("guess_matches",
        (col("lang_guess") === col("lang")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Rolling-hash document fingerprint (engine-portable polynomial hash —
    * see [[graft.functions.TextFunctions.charFingerprint]]).
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), charFingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-wide top-k word n-grams by frequency (duplicates within a doc
    * count). One explode + one partial/final hash aggregation.
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame =
    docs
      .select(explode(wordShingles(tokens(col("text")), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)

  /** Sequence packing with concat-and-chunk semantics — the pretraining
    * data-prep step: within each `streamCol` stream, documents are laid
    * end to end in doc_id order and the token stream is cut into
    * fixed-`budget` chunks; each doc reports the chunk span it lands in
    * (`chunk_first`..`chunk_last`, crossing a boundary when it straddles
    * a cut). Pure window arithmetic over a running token total — one
    * exchange per stream, the same shape as sessionization, and exactly
    * reproducible in ANSI SQL.
    *
    * At 100 TB the stream column bounds the per-partition ordered scan
    * (pack per language/shard/split, not one global stream, which would
    * serialize into a single task).
    */
  def packChunks(docs: DataFrame, streamCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(streamCol)).orderBy(col("doc_id"))
    docs
      .select(col(streamCol), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("tok_end", sum(col("n_tok")).over(w))
      .select(col(streamCol), col("doc_id"), col("n_tok"),
        (col("tok_end") - col("n_tok")).as("tok_start"),
        floor((col("tok_end") - col("n_tok")) / budget).cast("long").as("chunk_first"),
        floor((col("tok_end") - 1) / budget).cast("long").as("chunk_last"))
      .orderBy(col(streamCol), col("doc_id"))
  }

  /** Within-document repetition profile (Gopher-style duplicate-n-gram
    * signal): total n-gram occurrences vs distinct n-grams, and the
    * duplicate fraction `1 - distinct/total` — high values flag the
    * boilerplate/spam documents a pretraining corpus filters out.
    * Distinctness is computed over the portable hashed shingles, so the
    * DuckDB oracle reproduces every count. Narrow per-doc projection,
    * no shuffle.
    */
  def repetitionStats(docs: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val total = greatest(size(tokens(col("text"))) - (n - 1), lit(0)).cast("long")
    docs
      .select(col("doc_id"), total.as("total_ngrams"),
        size(hashedShingleSet(col("text"), n)).cast("long").as("distinct_ngrams"))
      .select(col("doc_id"), col("total_ngrams"), col("distinct_ngrams"),
        roundHalfUp(
          when(col("total_ngrams") > 0,
            lit(1.0) - col("distinct_ngrams").cast("double") /
              col("total_ngrams").cast("double"))
            .otherwise(lit(0.0)), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: for every training document, the number
    * of distinct word n-grams it shares with each benchmark document —
    * the overlap evidence used to drop contaminated training data before
    * an eval. Output (train_id, bench_id, shared_ngrams >= minShared).
    *
    * Shape: both sides explode their distinct hashed shingle sets into
    * an inverted index and meet in a hash join on the shingle; the count
    * per (train, bench) pair IS the intersection size (sets are
    * distinct), aggregated with map-side partials. The benchmark side is
    * always small relative to the corpus — broadcast it, so the corpus
    * streams through one stage with no shuffle of training postings.
    */
  def contaminationPairs(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         n: Int, minShared: Long): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    def postings(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        explode(hashedShingleSet(col(textCol), n)).as("sh"))
    postings(train, "train_id")
      .join(broadcast(postings(bench, "bench_id")), "sh")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .orderBy(col("train_id"), col("bench_id"))
  }

  /** Top-k TF-IDF terms per document — keyword extraction for corpus
    * curation and topic-balanced sampling. tf = in-doc term count,
    * idf = ln(N / df) with df = number of docs containing the term;
    * score rounded half-up at 6 dp BEFORE ranking so the (score DESC,
    * term ASC) order is reproducible across engines (sub-1e-6 libm
    * differences cannot flip ranks — equal rounded scores tie-break on
    * the term).
    *
    * Scale shape: explode → (doc, term) hash aggregation with map-side
    * partial counts; document frequency is a second decomposable
    * aggregate OVER THE (doc, term) PAIRS (already deduped — never
    * re-touches the corpus); the idf join is hash-partitioned by term
    * (AQE broadcasts when the vocabulary fits); the per-doc top-k window
    * partitions by doc_id — parallelism = corpus size, partition size =
    * distinct terms per doc, both bounded.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val total = docs.agg(count(lit(1)).cast("double").as("__n"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("score",
        roundHalfUp(col("tf") * log(col("__n") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("score"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Bigram language-model quality score (the CCNet/KenLM-style
    * perplexity filter, reduced to a bigram model trainable in two
    * aggregations): train token-bigram counts over the corpus itself,
    * then score each document by the mean Laplace-smoothed conditional
    * log-probability of its bigrams,
    * `avg(ln((C(w1,w2) + 1) / (C(w1,·) + V)))` with V = corpus vocabulary
    * size. Gibberish and boilerplate outliers score far below fluent
    * text; thresholding on `lm_score` is the filter.
    *
    * Scale shape: bigram counts are one explode + hash aggregation
    * (decomposable, map-side partials); context counts derive from the
    * bigram table, NOT a second corpus pass; scoring is a shuffle join on
    * the bigram key between the exploded corpus and the (much smaller)
    * count table, then a per-doc average. At 100 TB you'd additionally
    * frequency-prune the count table to top-K bigrams with a smoothed
    * default for the tail — documented trade, not needed for exactness
    * here. Docs with fewer than 2 tokens get n_bigrams = 0 and a null
    * score (nothing to model).
    */
  def bigramLmScore(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val tok = tokens(col(textCol))
    val bg = docs.select(col(idCol),
        explode(arrays_zip(
          slice(tok, lit(1), size(tok) - 1).as("w1"),
          slice(tok, lit(2), size(tok) - 1).as("w2"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val counts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val ctx = counts.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(tok).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("__v"))
    val scored = bg
      .join(counts, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        roundHalfUp(avg(log((col("c12") + lit(1.0)) /
          (col("c1") + col("__v")))), 6).as("lm_score"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .orderBy(col(idCol))
  }

  /** Overlapping sliding chunks of a document's token stream — the
    * retrieval/context-window chunking step (size `chunkSize`, stride
    * `stride` < chunkSize for overlap): chunk k covers tokens
    * `[1 + k·stride, min(1 + k·stride + chunkSize - 1, n)]`, and chunk
    * starts run while they stay within the document, so every token is
    * covered and the last chunk may be short. Output per chunk:
    * `(doc_id, chunk_id, tok_start, tok_end, n_chunk_tokens, chunk_text)`.
    *
    * Unlike [[packChunks]] (which concatenates documents end-to-end and
    * cuts fixed windows across document boundaries), this never crosses a
    * document: it is the document-preserving chunker used for retrieval
    * indexes and long-document training examples.
    *
    * Scale shape: narrow per-document `sequence` + `explode` — fan-out is
    * ceil(n / stride) per document, no shuffle anywhere; the slice/join
    * evaluate inside whole-stage codegen.
    */
  def slidingChunks(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize: size=$chunkSize stride=$stride")
    val tok = tokens(col("text"))
    docs
      .select(col("doc_id"), tok.as("tk"), size(tok).as("n"))
      .select(col("doc_id"), col("tk"), col("n"),
        posexplode(sequence(lit(1), col("n"), lit(stride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("tok_start"),
        least(col("col") + lit(chunkSize - 1), col("n")).cast("long").as("tok_end"),
        (least(col("col") + lit(chunkSize - 1), col("n")) - col("col") + 1)
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("tk"), col("col"), lit(chunkSize)), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Hashed-feature linear quality classifier (the fastText-style scorer
    * used as a cheap corpus-quality gate): each token hashes into one of
    * `dims` feature buckets; a bucket's weight is a fixed deterministic
    * function of the bucket id (an avalanche-mixed value mapped into
    * [-1, 1] at 1e-3 granularity — a stand-in for trained weights, which
    * this sandbox cannot fit; the plumbing is the real thing and swapping
    * in a learned weight table is a broadcast join); the document logit is
    * `bias + mean(weight)` and the score is the logistic of that.
    *
    * Determinism: weights are INTEGERS in [-1000, 1000] and the per-doc
    * feature sum aggregates as a long — exact in any order, on any
    * engine — so the logit is one division from integers and the keep
    * decision (`logit >= 0`) can never flip between engines.
    *
    * Scale shape: narrow per-document projection over the codegen'd
    * token-hash kernel; no shuffle, no UDF, no model service in the hot
    * path.
    */
  def hashedLinearScore(docs: DataFrame, textCol: String,
                        dims: Int = 1024, bias: Double = -0.1): DataFrame = {
    require(dims > 0)
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import graft.functions.SimHashBits.{MixAdd, MixMul, MixRounds}
    import graft.functions.TextFunctions.ShPrime
    val weights = transform(tokenHashes(col(textCol)), h => {
      val mixed = (0 until MixRounds).foldLeft(pmod(h, lit(dims.toLong)))(
        (acc, _) => (acc * lit(MixMul) + lit(MixAdd)) % lit(ShPrime))
      pmod(mixed, lit(2001L)) - lit(1000L)
    })
    docs
      .select(col("doc_id"),
        aggregate(weights, lit(0L), (acc, x) => acc + x).as("__s"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("__logit",
        lit(bias) + col("__s").cast("double") /
          (lit(1000.0) * col("n_tokens").cast("double")))
      .select(col("doc_id"), col("n_tokens"),
        // floor(x·1e6 + 0.5)/1e6 is pure IEEE arithmetic — deterministic
        // for negative logits too (half-ties round toward +inf on BOTH
        // engines; roundHalfUp's non-negative caveat is about naming, not
        // determinism)
        roundHalfUp(col("__logit"), 6).as("logit"),
        roundHalfUp(lit(1.0) / (lit(1.0) + exp(-col("__logit"))), 6).as("prob"),
        (col("__logit") >= 0).cast("long").as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Email pattern shared by the Spark and DuckDB sides: valid in both
    * Java regex and RE2 (no lookarounds, no backrefs).
    */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone pattern (word-bounded `ddd-ddd-dddd`). */
  val PhoneRegex = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII redaction over a text column: counts and masks emails, then
    * counts and masks phone numbers IN THE EMAIL-REDACTED text (a phone
    * embedded in an email local-part must not be double-counted) —
    * a fixed two-stage pipeline, reproducible in ANSI SQL. Adds
    * `n_emails`, `n_phones`, `redacted`; narrow per-row projection, no
    * shuffle, codegen'd regex execution.
    */
  def redactPii(docs: DataFrame, textCol: String): DataFrame = {
    val deEmailed = regexp_replace(col(textCol), EmailRegex, "<EMAIL>")
    docs
      .withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailRegex)).cast("long"))
      .withColumn("n_phones",
        regexp_count(deEmailed, lit(PhoneRegex)).cast("long"))
      .withColumn("redacted",
        regexp_replace(deEmailed, PhoneRegex, "<PHONE>"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, Appendix A,
    * "quality filtering"): per-document structural metrics plus the
    * conjunction keep flag, restricted to the rules computable from a
    * single-line text column — word-count band, mean-word-length band,
    * minimum alphabetic-word fraction, minimum stopword hits, and a
    * maximum top-word share (the single-word repetition screen; the
    * n-gram duplicate screen is [[repetitionStats]]).
    *
    * Scale shape: ONE narrow codegen'd projection, zero shuffle (only the
    * presentation sort at the end). The top-word count — the tempting
    * explode → (doc, word) count → per-doc max, a full-corpus shuffle of
    * every token — is instead the one-pass [[graft.functions.TokenRunStats]]
    * kernel over the token array: O(n log n) local work per document,
    * nothing crosses the wire. At 100 TB the difference is shuffling the
    * corpus vs shuffling nothing.
    */
  def gopherRules(docs: DataFrame,
                  minWords: Long = 30, maxWords: Long = 100000,
                  meanLenMin: Double = 3.0, meanLenMax: Double = 10.0,
                  minAlphaFrac: Double = 0.8, minStopHits: Long = 1,
                  maxTopWordFrac: Double = 0.12): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = tokens(col("text"))
    val metrics = docs.select(col("doc_id"),
      letBound(tok) { t =>
        struct(
          size(t).cast("long").as("n_tokens"),
          // split-on-space identity: sum of token lengths == text length
          // minus the separator count — exact for ANY text, one length()
          // call instead of a per-token pass
          (length(col("text")) - size(t) + 1).cast("double").as("sum_len"),
          size(filter(t, x => x.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
          stopwordHits(t, langStopwords.head._2).cast("long").as("stop_hits"),
          graft.functions.GraftFunctions.runStats(t)
            .getField("top_count").as("top_cnt"))
      }.as("m"))
      .select(col("doc_id"), col("m.*"))
    val n = col("n_tokens").cast("double")
    val meanLen = when(n > 0, col("sum_len") / n).otherwise(lit(0.0))
    val alphaFrac = when(n > 0, col("n_alpha").cast("double") / n).otherwise(lit(0.0))
    val topFrac = when(n > 0, col("top_cnt").cast("double") / n).otherwise(lit(0.0))
    val keep =
      col("n_tokens").between(minWords, maxWords) &&
        meanLen.between(meanLenMin, meanLenMax) &&
        alphaFrac >= minAlphaFrac &&
        col("stop_hits") >= minStopHits &&
        topFrac <= maxTopWordFrac
    metrics
      .select(col("doc_id"), col("n_tokens"),
        roundHalfUp(meanLen, 6).as("mean_word_len"),
        roundHalfUp(alphaFrac, 6).as("alpha_frac"),
        col("stop_hits"),
        roundHalfUp(topFrac, 6).as("top_word_frac"),
        when(keep, lit(1L)).otherwise(lit(0L)).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Per-document token-distribution entropy — the information-density
    * quality signal (near-zero entropy = TEMPLATED/repeated content even
    * when individual n-grams pass the repetition screens):
    * H = ln(n) − (Σ cᵢ·ln cᵢ)/n over token multiplicities cᵢ, plus the
    * ln(n)-normalized variant in [0, 1].
    *
    * Scale shape: like [[gopherRules]], the multiplicity profile comes
    * from the one-pass [[graft.functions.TokenRunStats]] kernel — one
    * narrow codegen'd projection, zero shuffle (only the presentation
    * sort) — instead of the explode → (doc, token) count pipeline that
    * would shuffle every token of the corpus for a per-document number.
    */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.runStats(tokens(col("text"))).as("m"))
      .select(col("doc_id"),
        col("m.n_tokens").as("n_tokens"),
        col("m.n_distinct").as("n_distinct"),
        roundHalfUp(
          when(col("m.n_tokens") > 0,
            log(col("m.n_tokens").cast("double")) -
              col("m.sum_c_ln_c") / col("m.n_tokens"))
            .otherwise(lit(0.0)), 6).as("entropy"),
        roundHalfUp(
          when(col("m.n_tokens") > 1,
            (log(col("m.n_tokens").cast("double")) -
              col("m.sum_c_ln_c") / col("m.n_tokens")) /
              log(col("m.n_tokens").cast("double")))
            .otherwise(lit(0.0)), 6).as("norm_entropy"))
      .orderBy(col("doc_id"))
  }

  /** Cross-source overlap matrix: for every pair of corpus sources, the
    * exact Jaccard similarity of their distinct hashed word-n-gram
    * vocabularies — the contamination diagnostic a curation pipeline runs
    * BEFORE mixing sources (two crawls of the same site, a dataset that
    * repackages another, a benchmark leaked into a training source all
    * show up as an off-diagonal spike). Output one row per unordered
    * source pair: (src_a, src_b, sz_a, sz_b, common, jaccard),
    * deterministic order.
    *
    * Scale shape: the per-source vocabulary is a distinct partial
    * aggregation over the shingle kernel's output (the shuffle carries
    * distinct (source, shingle) rows, never raw postings); per-source
    * sizes are one tiny grouped count (|sources| rows, broadcast back);
    * the pairwise intersection is an inverted-index self-join keyed on
    * the shingle followed by a decomposable pair count — a shingle
    * present in df sources contributes C(df,2) pair rows, so total join
    * work is Σ C(df_s,2) ≤ |vocab|·C(|sources|,2)/|vocab| — bounded by
    * the source count, NOT the document count, and there is no
    * document-level pairing anywhere. The vocabulary frame feeds both
    * join sides, so the exchange on the shingle key is computed once and
    * reused.
    */
  /** MinHash-approximate twin of [[sourceOverlapMatrix]] — the 100 TB
    * path. The exact matrix self-joins the full per-source vocabulary
    * (shuffle O(distinct (source, shingle))); at web-crawl scale a single
    * source's vocabulary is billions of shingles and even the deduped
    * postings join dominates. This variant compresses each source to a
    * k-value MinHash signature and estimates Jaccard as the fraction of
    * matching signature positions (the classic unbiased estimator,
    * stderr ≈ sqrt(J(1−J)/k)).
    *
    * The load-bearing property: the signature of a vocabulary UNION is
    * the element-wise minimum of the members' signatures. So the
    * per-source signature needs no vocabulary materialization at all —
    * each document computes its own signature with the codegen'd
    * [[graft.functions.MinHashSig]] kernel (no shuffle), and one grouped
    * min-aggregation folds them: the shuffle carries at most
    * |sources|·k·partitions partial minima, INDEPENDENT of corpus size.
    * The pairwise compare then runs on |sources|·k rows — driver-trivial
    * however big the corpus.
    *
    * Same coefficient family as every MinHash op here
    * ([[graft.functions.MinHashCoeffs]]), so the oracle reproduces each
    * signature value bit-for-bit. Output: (src_a, src_b, matches,
    * est_jaccard), src_a < src_b, pairs with zero matching positions
    * omitted (mirrors the exact matrix, where zero-intersection pairs
    * never join). Sources whose documents yield no shingles carry no
    * signature and are absent, as in the exact matrix.
    */
  def sourceOverlapMinHash(docs: DataFrame, groupCol: String, textCol: String,
                           n: Int = 3, numHashes: Int = 64,
                           minEstJaccard: Double = 0.0): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sig = docs
      .select(col(groupCol).as("src"),
        graft.functions.GraftFunctions.minHashSig(
          hashedShingleSet(col(textCol), n), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("src"), posexplode(col("sig")).as(Seq("pos", "mh")))
      .groupBy(col("src"), col("pos")).agg(min(col("mh")).as("mh"))
    val matches = sig.select(col("src").as("src_a"), col("pos"), col("mh"))
      .join(sig.select(col("src").as("src_b"), col("pos"), col("mh")),
        Seq("pos", "mh"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("matches"))
    matches
      .withColumn("est_jaccard",
        roundHalfUp(col("matches").cast("double") / lit(numHashes), 6))
      .filter(col("est_jaccard") >= minEstJaccard)
      .orderBy(col("src_a"), col("src_b"))
  }

  def sourceOverlapMatrix(docs: DataFrame, groupCol: String, textCol: String,
                          n: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val vocab = docs
      .select(col(groupCol).as("src"),
        explode(hashedShingleSet(col(textCol), n)).as("tok"))
      .distinct()
    val sizes = vocab.groupBy(col("src")).agg(count(lit(1)).as("sz"))
    val common = vocab.select(col("src").as("src_a"), col("tok"))
      .join(vocab.select(col("src").as("src_b"), col("tok")), Seq("tok"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(broadcast(sizes.select(col("src").as("src_a"),
        col("sz").as("sz_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("src").as("src_b"),
        col("sz").as("sz_b"))), Seq("src_b"))
      .withColumn("jaccard", roundHalfUp(col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("src_a"), col("src_b"), col("sz_a"), col("sz_b"),
        col("common"), col("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }
}
