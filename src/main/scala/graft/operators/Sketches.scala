package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Mergeable frequency sketches over the portable hash family.
  *
  * The approximate tier (SURVEY.md §2.3) already covers distinct counts
  * (HLL), quantiles, and frequent items with Spark built-ins; this adds
  * the count-min sketch, whose portable-hash construction makes the whole
  * sketch — collisions and overcounts included — reproducible by the
  * DuckDB oracle (see [[graft.functions.CountMinAgg]]).
  */
object Sketches {

  /** ONE-row frame `{sk: array<long>}` — the depth×width count-min sketch
    * of `key` over `df` (decomposable aggregate: map-side partial
    * sketches, shuffle carries d·w·8 bytes per task).
    */
  def countMinSketch(df: DataFrame, key: Column,
                     depth: Int = 4, width: Int = 128): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.agg(GraftFunctions.countMinAgg(
      GraftFunctions.bloomPositions(key, depth, width), depth, width).as("sk"))
  }

  /** Per-group KMV distinct-count synopses of `value` (hashed here with
    * the codegen'd `xxhash64` — uniform on the unsigned 64-bit range the
    * estimator needs). Decomposable: map-side partials carry ≤ k longs
    * per group, the result table is O(groups · k) and broadcastable —
    * the build is the ONLY corpus scan any set-algebra answer needs.
    * See [[graft.functions.KmvAgg]].
    */
  def kmvSketches(df: DataFrame, group: Column, value: Column,
                  k: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.groupBy(group.as("grp"))
      .agg(GraftFunctions.kmvAgg(xxhash64(value), k).as("sk"))
  }

  /** Pairwise intersection-cardinality estimates over a [[kmvSketches]]
    * table: every unordered group pair (grp_a < grp_b) with `common_est`
    * — |A ∩ B| estimated from the two synopses alone (Beyer et al. 2007
    * K-min combine; see [[graft.functions.KmvIntersectEstimate]]). The
    * sketch table self-joins BROADCAST (O(groups·k) bytes), so sizing
    * the overlap of every source pair in a 100 TB corpus costs one scan
    * (the build) + driver-scale pair work — never a shingle re-join.
    */
  def kmvOverlapMatrix(sketches: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(sketches.sparkSession)
    sketches.select(col("grp").as("grp_a"), col("sk").as("sk_a"))
      .join(broadcast(sketches.select(col("grp").as("grp_b"),
        col("sk").as("sk_b"))), col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        GraftFunctions.kmvIntersect(col("sk_a"), col("sk_b"), k)
          .as("common_est"))
  }

  /** Exact equi-join with a Bloom runtime filter: build a filter over the
    * (small) dim side's keys and screen the fact side BEFORE its shuffle —
    * the explicit, engine-portable form of the runtime row-filter
    * optimizers inject. Bloom false positives are removed by the join
    * itself, so the result is bit-identical to the plain join; what
    * changes is the exchanged volume: only fact rows whose key might
    * match travel (selective dims drop the fact shuffle by orders of
    * magnitude). False negatives are impossible, so no row is lost.
    */
  def bloomPrefilteredJoin(fact: DataFrame, dim: DataFrame,
                           factKey: String, dimKey: String,
                           mBits: Int = 1 << 18, k: Int = 7): DataFrame = {
    GraftFunctions.register(fact.sparkSession)
    val bloom = Dedup.bloomFilter(dim, col(dimKey), mBits, k)
    val screened = Dedup.bloomScreen(fact, bloom, col(factKey), mBits, k)
      .filter(col("maybe_dup")).drop("maybe_dup")
    // dataframe-qualified refs: with factKey == dimKey an unqualified
    // col() would be ambiguous and fail analysis
    screened.join(dim, screened(factKey) === dim(dimKey))
  }

  /** Adds `cm_est` — the sketch's count estimate for `key` on every row
    * of `keys` (broadcast of the one-row sketch; no shuffle of `keys`).
    * Estimates never undercount: cm_est ≥ the true count, with equality
    * unless the key collided in all depth rows.
    */
  def countMinEstimates(keys: DataFrame, sketch: DataFrame, key: Column,
                        depth: Int = 4, width: Int = 128): DataFrame = {
    GraftFunctions.register(keys.sparkSession)
    keys.crossJoin(broadcast(sketch))
      .withColumn("cm_est", GraftFunctions.countMinEstimate(col("sk"),
        GraftFunctions.bloomPositions(key, depth, width), width))
      .drop("sk")
  }
}
