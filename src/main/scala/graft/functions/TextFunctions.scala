package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators (SURVEY.md §2.3). All built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs — so they stay inside
  * whole-stage codegen and distribute trivially.
  *
  * Determinism contract: every function here is a pure function of its
  * input column, reproducible in ANSI SQL (the DuckDB oracle twins in
  * `SparkEntry.oracleSql` mirror these formulas exactly).
  */
object TextFunctions {

  /** Modulus for the rolling fingerprint — keeps the accumulator well inside
    * 63 bits so Spark's and the oracle's BIGINT arithmetic agree (no wrap).
    */
  val FpPrime = 1000000007L
  val FpBase  = 131L

  /** Larger prime modulus (largest prime < 2^53) for shingle hashing —
    * collision space big enough for corpus-scale shingle vocabularies while
    * `acc * 131 + x` still fits in a 64-bit signed int on both engines.
    */
  val ShPrime = 9007199254740881L

  /** Whitespace tokens (single-space convention of the fixture corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Expression-level let-binding: evaluates `value` ONCE and exposes it to
    * `body` as a lambda variable. Without this, referencing a sub-expression
    * k times (e.g. `element_at(expensiveArray, …)` inside a `transform`
    * lambda) duplicates the whole sub-tree k times per row — measured 27×
    * slowdown on the shingle pipeline. `transform` over a 1-element array
    * is the cheapest "let" Catalyst offers.
    */
  def letBound(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Word n-gram shingles ("a b c" style), empty array when too short.
    * Non-distinct — callers that need set semantics apply `array_distinct`.
    */
  def wordShingles(tok: Column, n: Int): Column =
    letBound(tok) { t =>
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - lit(n)),
          i => concat_ws(" ", (0 until n).map(j => element_at(t, i + lit(j + 1))): _*)))
        .otherwise(array().cast("array<string>"))
    }

  /** Distinct word n-gram shingle set of a text column. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(wordShingles(tokens(text), n))

  /** Jaccard similarity of two array columns under set semantics. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
                 size(array_union(a, b)).cast("double"))

  /** Rolling polynomial hash of the document's characters:
    * fold(codepoints, 0, (acc, c) => (acc * 131 + c) mod 1e9+7).
    * Deterministic and engine-portable (the oracle reproduces it with
    * `list_reduce`), unlike murmur/xxhash which are Spark-internal.
    * Backed by the codegen'd [[PolyCharFold]] kernel (callers must have
    * run [[GraftFunctions.register]] — every graft operator does).
    */
  def charFingerprint(text: Column): Column =
    call_function("graft_charfold", text)

  /** Per-token polynomial hash (mod [[ShPrime]]) — portable to the oracle.
    * Backed by the codegen'd [[PolyTokenHashes]] kernel.
    */
  def tokenHashes(text: Column): Column =
    call_function("graft_token_hashes", text)

  /** Distinct word n-gram shingles hashed to longs, SORTED ascending (the
    * order every pairwise consumer needs). Long-array set ops are ~10×
    * cheaper than string-array ops in the pairwise-Jaccard hot loop, and
    * the hash is reproducible in ANSI SQL (unlike xxhash64). Backed by the
    * codegen'd [[PolyShingleSet]] kernel.
    */
  def hashedShingleSet(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** ORDERED rolling window hashes (duplicates kept; position = index + 1)
    * — the positions-preserving counterpart of [[hashedShingleSet]] for
    * span-level dedup. Backed by the codegen'd [[PolyWindowHashes]]
    * kernel: the HOF formulation walks Spark's interpreted lambda path
    * per window (measured 10×+ slower at sf0.1).
    */
  def windowHashes(text: Column, n: Int): Column =
    call_function("graft_window_hashes", text, lit(n))

  // ---- higher-order-function reference formulations ----
  // Kept as executable documentation + cross-check targets for the kernel
  // parity specs: same math, built only from org.apache.spark.sql.functions.

  private[graft] def charFingerprintHof(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * lit(FpBase) + x) % lit(FpPrime))

  private[graft] def tokenHashesHof(text: Column): Column =
    transform(tokens(text), t =>
      aggregate(transform(split(t, ""), ch => ascii(ch).cast("long")),
        lit(0L), (acc, x) => (acc * lit(FpBase) + x) % lit(ShPrime)))

  private[graft] def windowHashesHof(text: Column, n: Int): Column =
    letBound(tokenHashesHof(text)) { th =>
      when(size(th) >= n,
        transform(sequence(lit(0), size(th) - lit(n)), i =>
          (0 until n).foldLeft(lit(0L))((acc, j) =>
            (acc * lit(FpBase) + element_at(th, i + lit(j + 1))) % lit(ShPrime))))
        .otherwise(array().cast("array<long>"))
    }

  private[graft] def hashedShingleSetHof(text: Column, n: Int): Column =
    letBound(tokenHashesHof(text)) { th =>
      array_distinct(
        when(size(th) >= n,
          transform(sequence(lit(0), size(th) - lit(n)), i =>
            (0 until n).foldLeft(lit(0L))((acc, j) =>
              (acc * lit(FpBase) + element_at(th, i + lit(j + 1))) % lit(ShPrime))))
          .otherwise(array().cast("array<long>")))
    }

  /** Cross-engine deterministic half-up rounding for NON-NEGATIVE values:
    * floor(x·10^n + 0.5)/10^n. `round()` delegates tie-breaking on doubles
    * to engine-specific implementations (observed: Spark and DuckDB split
    * on scores landing exactly on a 1e-6 half-boundary); this is a pure
    * IEEE double formula, so any engine evaluating the same input double
    * produces identical bits. Rational-valued outputs (ratios, Jaccard,
    * averages of exact decimals) hit ties in practice — always use this
    * for them in oracle-checked queries.
    */
  def roundHalfUp(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Count of tokens that appear in `words` (duplicates counted). */
  def stopwordHits(tok: Column, words: Seq[String]): Column =
    size(filter(tok, t => t.isin(words: _*)))

  /** Tiny per-language stopword profiles for the heuristic language ID.
    * Deterministic tie-break order is the Seq order used by the caller.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))
}
