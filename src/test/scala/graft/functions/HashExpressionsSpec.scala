package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Kernel parity: the codegen'd signature expressions vs independent
  * Scala references on seeded random inputs.
  */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(9)
  private val rows: Seq[(Long, Seq[Long])] = (0 until 100).map { i =>
    // & Long.MaxValue, not .abs: Math.abs(Long.MinValue) overflows negative
    (i.toLong, Seq.fill(1 + rnd.nextInt(50))((rnd.nextLong() & Long.MaxValue) % TextFunctions.ShPrime))
  }

  test("SimHashBits matches a scala reference fold") {
    GraftFunctions.register(spark)
    val w = 48
    val got = rows.toDF("id", "hs")
      .select(col("id"), GraftFunctions.simHashBits(col("hs"), w).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, hs) =>
      val cnt = new Array[Int](w)
      hs.foreach { h0 =>
        var h = h0
        (0 until SimHashBits.MixRounds).foreach { _ =>
          h = (h * SimHashBits.MixMul + SimHashBits.MixAdd) % TextFunctions.ShPrime
        }
        (0 until w).foreach(b =>
          cnt(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1))
      }
      val want = (0 until w).map(b => if (cnt(b) > 0) 1L << b else 0L).sum
      assert(got(id) == want, s"doc $id")
    }
  }

  test("MinHashSig matches a scala reference over the seeded family") {
    GraftFunctions.register(spark)
    val k = 32
    val (as, bs) = MinHashCoeffs(k)
    val got = rows.toDF("id", "hs")
      .select(col("id"), GraftFunctions.minHashSig(col("hs"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, hs) =>
      val want = (0 until k).map(j =>
        hs.map(x => (as(j) * (x % MinHashCoeffs.Prime) + bs(j)) % MinHashCoeffs.Prime).min)
      assert(got(id) == want, s"doc $id")
    }
  }

  test("MinHashSig of an empty set is null") {
    GraftFunctions.register(spark)
    val r = Seq((0L, Seq.empty[Long])).toDF("id", "hs")
      .select(GraftFunctions.minHashSig(col("hs"), 8)).collect()(0)
    assert(r.isNullAt(0))
  }

  // ---- PolyHash kernels vs the higher-order-function formulations ----
  // Same math, two independent evaluation paths; includes CJK (BMP) text,
  // multi-space runs, and leading/trailing spaces (empty tokens).

  private val texts = Seq(
    "", " ", "a", "a b c", "the quick brown fox", "trailing space ",
    " leading", "double  space", "的 是 了 在 我", "mixed 的 tokens 了",
    "x" * 300) ++ (0 until 50).map { i =>
    val r = new scala.util.Random(i)
    Seq.fill(1 + r.nextInt(30))(
      Seq.fill(1 + r.nextInt(8))((33 + r.nextInt(94)).toChar).mkString)
      .mkString(" ")
  }

  test("PolyCharFold kernel equals the HOF charFingerprint") {
    GraftFunctions.register(spark)
    val rows = texts.toDF("text").select(
      TextFunctions.charFingerprint(col("text")),
      TextFunctions.charFingerprintHof(col("text"))).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("PolyTokenHashes kernel equals the HOF tokenHashes") {
    GraftFunctions.register(spark)
    val rows = texts.toDF("text").select(
      TextFunctions.tokenHashes(col("text")),
      TextFunctions.tokenHashesHof(col("text"))).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("PolyShingleSet kernel equals sorted HOF hashedShingleSet") {
    GraftFunctions.register(spark)
    for (n <- Seq(2, 3, 5)) {
      val rows = texts.toDF("text").select(
        TextFunctions.hashedShingleSet(col("text"), n),
        array_sort(TextFunctions.hashedShingleSetHof(col("text"), n))).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n"))
    }
  }

  test("PolyWindowHashes kernel equals the HOF window fold, order kept") {
    GraftFunctions.register(spark)
    for (n <- Seq(2, 3, 8)) {
      val rows = texts.toDF("text").select(
        TextFunctions.windowHashes(col("text"), n),
        TextFunctions.windowHashesHof(col("text"), n)).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n"))
    }
  }
}
