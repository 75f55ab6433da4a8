package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit contracts for the KMV set-algebra sketches beyond the
  * fixture-level accuracy gates in `SketchAccuracySpec`:
  * exactness below k, merge distributivity (split-and-union ≡ whole —
  * the property map-side partial aggregation and the a7 rollup both
  * rest on), unsigned hash ordering (negative longs are LARGE unsigned
  * values and must never displace small minima), and intersection
  * exactness when both sides hold their full distinct-hash sets.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64

  test("below k the sketch is its side's full distinct-hash set: " +
      "estimate and intersection are EXACT") {
    GraftFunctions.register(spark)
    // 40 distinct values per side (< k = 64), overlapping in [20, 39]
    val a = (0L until 40L).toDF("v")
    val b = (20L until 60L).toDF("v")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(GraftFunctions.kmvAgg(xxhash64(col("v")), k).as("sk"))
    val est = sk(a).crossJoin(sk(b).select(col("sk").as("sk_b")))
      .select(
        GraftFunctions.kmvEstimate(col("sk"), k).as("da"),
        GraftFunctions.kmvEstimate(col("sk_b"), k).as("db"),
        GraftFunctions.kmvIntersect(col("sk"), col("sk_b"), k).as("i"))
      .head()
    assert(est.getDouble(0) == 40.0)
    assert(est.getDouble(1) == 40.0)
    assert(est.getDouble(2) == 20.0)
  }

  test("merge distributivity: sketching disjoint halves and union-" +
      "merging equals sketching the whole (bit-for-bit)") {
    GraftFunctions.register(spark)
    val n = 10000L
    val whole = spark.range(0L, n).toDF("v")
      .agg(GraftFunctions.kmvAgg(xxhash64(col("v")), k).as("sk"))
      .head().getSeq[Long](0)
    val merged = spark.range(0L, n).toDF("v")
      .withColumn("half", col("v") % 7)
      .groupBy(col("half"))
      .agg(GraftFunctions.kmvAgg(xxhash64(col("v")), k).as("sk"))
      .agg(GraftFunctions.kmvUnionAgg(col("sk"), k).as("u"))
      .head().getSeq[Long](0)
    assert(whole == merged,
      "union-merge of per-group sketches must equal the direct sketch")
    assert(whole.size == k)
  }

  test("duplicates never inflate: sketching each value once equals " +
      "sketching it many times") {
    GraftFunctions.register(spark)
    val once = spark.range(0L, 5000L).toDF("v")
      .agg(GraftFunctions.kmvAgg(xxhash64(col("v")), k).as("sk"))
      .head().getSeq[Long](0)
    val dup = spark.range(0L, 50000L).select((col("id") % 5000L).as("v"))
      .agg(GraftFunctions.kmvAgg(xxhash64(col("v")), k).as("sk"))
      .head().getSeq[Long](0)
    assert(once == dup)
  }

  test("unsigned ordering: negative hash longs are LARGE values and " +
      "cannot displace small unsigned minima") {
    // direct buffer check — xxhash64 emits the full signed range, and a
    // signed comparator would sort every negative hash FIRST, poisoning
    // the minima set with what are unsigned-largest values
    val buf = new KmvOps.Buffer(4)
    Seq(5L, -1L, 3L, Long.MinValue, 10L, 7L).foreach(buf.add)
    // unsigned order: 3, 5, 7, 10 < Long.MinValue (2^63) < -1 (2^64-1)
    assert(buf.toSortedArray.toSeq == Seq(3L, 5L, 7L, 10L))
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buf.toSortedArray)
    assert(KmvOps.estimate(arr, 4) > 0)
  }

  test("estimate accuracy on a synthetic 1M-distinct column is within " +
      "4/sqrt(k-2) at k=256") {
    GraftFunctions.register(spark)
    val kk = 256
    val n = 1000000L
    val est = spark.range(0L, n).toDF("v")
      .agg(GraftFunctions.kmvAgg(xxhash64(col("v")), kk).as("sk"))
      .select(GraftFunctions.kmvEstimate(col("sk"), kk))
      .head().getDouble(0)
    val relErr = math.abs(est - n) / n.toDouble
    info(f"kmv 1M-distinct estimate: ${est.toLong} (relErr=$relErr%.4f)")
    assert(relErr <= 4.0 / math.sqrt(kk - 2.0))
  }
}
