package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale training-data pipelines
  * (north-star tier, SURVEY.md §2.3): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - Exact dedup is one hash shuffle on the key with map-side partial
  *    aggregation — the minimum possible.
  *  - MinHash/LSH turns the O(n²) near-dup problem into a hash-partition
  *    bucket join: each doc emits `bands` small keys, candidates are pairs
  *    sharing a band bucket, and only candidates pay the exact-Jaccard
  *    verification. Bucket skew (a degenerate shingle shared by millions of
  *    docs) is capped via `maxBucket`.
  *  - SimHash reduces each doc to a 64-bit signature; near-dups cluster by
  *    signature band, again a bucket join rather than a cross join.
  *  - The blocked exact-Jaccard and cosine variants are quadratic *within a
  *    block only* — blocks (language × length bucket, or embedding label)
  *    bound the pair count, and the blocks shuffle independently.
  */
object Dedup {

  /** Exact dedup: keep one deterministic representative row per key
    * (lowest `tieBreaker`). `dropDuplicates` alone keeps an arbitrary row —
    * unacceptable for a reproducible pipeline.
    *
    * Default path is `min_by(struct(payload), tieBreaker)` aggregation:
    * a decomposable aggregate, so each map task reduces its partition to
    * one candidate row per key BEFORE the exchange. At 100 TB with a high
    * dup ratio that is the difference between shuffling the corpus and
    * shuffling the distinct keys. Output columns keep the input order.
    */
  def exactDedup(df: DataFrame, keys: Seq[String], tieBreaker: String): DataFrame = {
    val payload = df.columns.toSeq.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(payload.map(col): _*), col(tieBreaker)).as("__rep"))
      .select(df.columns.toSeq.map(c =>
        if (keys.contains(c)) col(c) else col("__rep").getField(c).as(c)): _*)
  }

  /** Window-based variant of [[exactDedup]] (row_number = 1). Same result;
    * no map-side partial reduction (the whole input shuffles), but the rows
    * pass through untouched — use when column order/metadata must survive
    * bit-exactly or when the payload is too wide to pack into a struct.
    */
  def exactDedupWindow(df: DataFrame, keys: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash parameters: signature of `numHashes` values split into
    * `bands` bands of `numHashes / bands` rows each. Defaults tuned for
    * Jaccard ≥ ~0.5 recall with 32 hashes × 8 bands.
    */
  final case class MinHashParams(numHashes: Int = 32, bands: Int = 8,
                                 shingle: Int = 3, threshold: Double = 0.5,
                                 maxBucket: Int = 1000) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** Prime modulus for the affine MinHash permutations (fits in 31 bits so
    * a*x+b stays inside a long).
    */
  private val MhPrime = 2038074743L

  /** Deterministic affine coefficients (a_i, b_i), seeded. */
  private def mhCoeffs(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
                 rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Adds `shingles` (distinct hashed word n-grams, array<long>) and
    * `minhash` (array<long> signature) columns. The shingle hash is the
    * portable polynomial hash (TextFunctions.hashedShingleSet); the
    * signature applies k affine permutations over those longs — one pass
    * per hash function, all inside array expressions, no strings, no UDFs.
    */
  def withMinHashSignature(df: DataFrame, textCol: String,
                           p: MinHashParams = MinHashParams()): DataFrame = {
    val base = df
      .withColumn("shingles", hashedShingleSet(col(textCol), p.shingle))
      .withColumn("__sh_hashes",
        transform(col("shingles"), x => pmod(x, lit(MhPrime))))
    val sig = array(mhCoeffs(p.numHashes).map { case (a, b) =>
      array_min(transform(col("__sh_hashes"),
        x => pmod(x * lit(a) + lit(b), lit(MhPrime))))
    }: _*)
    base.withColumn("minhash", sig).drop("__sh_hashes")
  }

  /** Near-duplicate pairs via MinHash banding LSH, verified with exact
    * Jaccard on the shingle sets. Output: (id_a, id_b, jaccard) with
    * id_a < id_b, jaccard >= threshold, deterministic order.
    */
  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          p: MinHashParams = MinHashParams()): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val signed = withMinHashSignature(df, textCol, p)
      .filter(size(col("shingles")) > 0)
      .select(col(idCol).as("id"),
        array_sort(col("shingles")).as("shingles"), col("minhash"))

    // Explode into (band, bandKey) rows; bandKey is the band's slice of the
    // signature hashed to one long so the join key is small on the wire.
    val bandStructs = array((0 until p.bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until p.rowsPerBand).map(r =>
            element_at(col("minhash"), b * p.rowsPerBand + r + 1)): _*))
          .as("bkey"))
    }: _*)
    val exploded = signed
      .select(col("id"), explode(bandStructs).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))

    // Cap pathological buckets (skew guard for the self-join at scale).
    val wB = Window.partitionBy(col("band"), col("bkey")).orderBy(col("id"))
    val capped = exploded
      .withColumn("__bn", row_number().over(wB))
      .filter(col("__bn") <= p.maxBucket)
      .drop("__bn")

    val l = capped.select(col("band"), col("bkey"), col("id").as("id_a"))
    val r = capped.select(col("band"), col("bkey"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // Exact-Jaccard verification: intersection size computed ONCE per
    // pair; union size derived arithmetically (|A|+|B|-∩) instead of a
    // second set operation.
    val sh = signed.select(col("id"), col("shingles"),
      size(col("shingles")).as("sz"))
    candidates
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a"),
        col("sz").as("sz_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b"),
        col("sz").as("sz_b")), "id_b")
      .withColumn("inter",
        GraftFunctions.intersectCountSorted(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("jaccard",
        roundHalfUp(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= p.threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 64-bit SimHash of the token stream: per bit, sum +1/-1 weighted by the
    * token hashes' bits; the signature bit is the sign of the sum. Built as
    * a single SQL expression (aggregate + zip_with) — one pass per doc.
    */
  def simHash64(textCol: String): Column =
    expr(
      s"""
         |aggregate(
         |  aggregate(
         |    transform(split($textCol, ' '), t -> xxhash64(t)),
         |    array_repeat(0L, 64),
         |    (acc, h) -> zip_with(acc,
         |      transform(sequence(0, 63),
         |        b -> IF((shiftright(h, b) & 1) = 1, 1L, -1L)),
         |      (x, y) -> x + y)),
         |  named_struct('i', 0, 'v', 0L),
         |  (st, cnt) -> named_struct(
         |      'i', st.i + 1,
         |      'v', st.v + IF(cnt > 0, shiftleft(1L, st.i), 0L)),
         |  st -> st.v)
       """.stripMargin)

  /** Docs annotated with their SimHash signature plus a band key for
    * near-dup clustering (docs sharing any 16-bit band are candidates).
    */
  def withSimHash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("simhash", simHash64(textCol))

  /** Embedding near-dup pairs: within `blockCol` blocks, pairs with cosine
    * >= threshold (cosine via the codegen'd native expression). Quadratic
    * within a block only; blocks shuffle independently.
    */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val a = emb.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(GraftFunctions.cosineSim(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Blocked exact n-gram Jaccard near-dup pairs: candidate pairs are
    * restricted to the same (`blockCols` × shingle-count log2 bucket) and
    * verified with exact Jaccard over distinct word n-gram sets.
    *
    * The length bucketing is LOSSLESS: Jaccard >= t forces
    * max(|A|,|B|)/min(|A|,|B|) <= 1/t, so the log2 buckets of a qualifying
    * pair differ by at most ceil(log2(1/t)); each doc probes its own bucket
    * plus that many above, and the exact size-ratio prune below removes the
    * slack. The result set is IDENTICAL to the unbucketed join, but the
    * per-block pair count is bounded by docs-of-similar-length — at corpus
    * scale this turns an O(block²) job whose block key (e.g. language) is
    * unbounded into one whose blocks stay small no matter how the corpus
    * grows. Bucket = floor(log2(sz)) computed as length(bin(sz))-1 — exact
    * integer math, immune to FP boundary wobble at powers of two.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[Column], n: Int,
                        threshold: Double): DataFrame = {
    // Shingles are hashed to longs (portable polynomial hash) — the
    // pairwise intersect/union below is the hot loop, and long-array set
    // ops are far cheaper than string-array ops.
    // Sets sorted ascending ONCE per document so every pair check is a
    // linear two-pointer merge (IntersectCountSorted) instead of a
    // per-pair hash set.
    val withSets = df
      .withColumn("__blk", concat_ws(" ", blockCols: _*))
      .withColumn("__sh", array_sort(hashedShingleSet(col(textCol), n)))
      .filter(size(col("__sh")) > 0)
      .select(col("__blk"), col(idCol).as("id"), col("__sh"),
        size(col("__sh")).as("__sz"))
      .withColumn("__lb", (length(bin(col("__sz"))) - 1).cast("int"))
    val span = math.ceil(math.log(1.0 / threshold) / math.log(2.0)).toInt
    // Side A probes its own bucket and the `span` buckets above it; side B
    // sits in its own bucket. A same-bucket pair arrives twice (both docs
    // probe offset 0) and is deduped by id order; a cross-bucket pair
    // arrives exactly once (only the shorter doc probes upward).
    val a = withSets
      .withColumn("__probe",
        explode(array((0 to span).map(o => col("__lb") + lit(o)): _*)))
      .select(col("__blk"), col("__probe"), col("__lb").as("lb_a"),
        col("id").as("id_a"), col("__sh").as("sh_a"), col("__sz").as("sz_a"))
    val b = withSets.select(col("__blk"), col("__lb").as("__probe"),
      col("__lb").as("lb_b"), col("id").as("id_b"),
      col("__sh").as("sh_b"), col("__sz").as("sz_b"))
    // Length filter (exact prune, not an approximation): Jaccard >= t
    // implies min(|A|,|B|) / max(|A|,|B|) >= t, so pairs failing the size
    // ratio can never qualify — skip their intersect entirely.
    a.join(b, Seq("__blk", "__probe"))
      .filter((col("lb_a") =!= col("lb_b") || col("id_a") < col("id_b")) &&
        col("sz_a") * lit(threshold) <= col("sz_b") &&
        col("sz_b") * lit(threshold) <= col("sz_a"))
      .withColumn("inter",
        GraftFunctions.intersectCountSorted(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("jaccard",
        roundHalfUp(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
