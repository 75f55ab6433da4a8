package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  /** Plain-Scala reimplementation of the polynomial fingerprint. */
  private def refFp(s: String, p: Long = FpPrime): Long =
    s.foldLeft(0L)((acc, c) => (acc * FpBase + c.toLong) % p)

  test("charFingerprint matches independent fold") {
    val inputs = Seq("hello", "a", "spark sql engine", "zz top")
    val got = inputs.toDF("text")
      .select(charFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(refFp(_)))
  }

  test("charFingerprint matches independent fold on 200 seeded random strings") {
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(80))((33 + rnd.nextInt(94)).toChar).mkString)
    val got = strs.toDF("text")
      .select(charFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(got.toSeq == strs.map(refFp(_)))
  }

  test("wordShingles produces n-grams in order; short docs give empty") {
    val got = Seq("a b c d", "a b", "").toDF("text")
      .select(wordShingles(tokens(col("text")), 3))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq())
    assert(got(2) == Seq())
  }

  test("hashedShingleSet equals hashing the string shingles (set equality)") {
    def refTok(t: String): Long = t.foldLeft(0L)((a, c) => (a * FpBase + c.toLong) % ShPrime)
    def refShingle(ts: Seq[String]): Long =
      ts.map(refTok).foldLeft(0L)((a, h) => (a * FpBase + h) % ShPrime)
    val text = "the quick brown fox jumps over the lazy dog the quick brown"
    val toks = text.split(" ").toSeq
    val expect = toks.sliding(3).map(refShingle).toSet
    val got = Seq(text).toDF("text")
      .select(hashedShingleSet(col("text"), 3)).collect()(0).getSeq[Long](0).toSet
    assert(got == expect)
  }

  test("letBound evaluates the bound value once (semantic identity)") {
    val got = Seq("x y z").toDF("text")
      .select(letBound(tokens(col("text")))(t => size(t) + size(t)))
      .collect()(0).getInt(0)
    assert(got == 6)
  }

  test("jaccard bounds and identities") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),   // identical -> 1
      (Seq("a"), Seq("b")),             // disjoint -> 0
      (Seq("a", "b"), Seq("b", "c"))    // overlap 1/3
    ).toDF("x", "y")
    val got = df.select(TextFunctions.jaccard(col("x"), col("y"))).collect().map(_.getDouble(0))
    assert(got(0) == 1.0 && got(1) == 0.0)
    assert(math.abs(got(2) - 1.0 / 3.0) < 1e-12)
  }
}

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def refCos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    a.zip(b).foreach { case (x, y) =>
      dot += x.toDouble * y.toDouble; nx += x.toDouble * x.toDouble; ny += y.toDouble * y.toDouble
    }
    if (nx == 0 || ny == 0) 0.0 else dot / math.sqrt(nx * ny)
  }

  private val vecs = Seq(
    (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
    (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
    (Seq(0.5f, -0.25f, 3f), Seq(-1f, 2f, 0.125f)),
    (Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)))

  test("CosineSimilarity matches sequential-double reference (codegen on)") {
    GraftFunctions.register(spark)
    val got = vecs.toDF("a", "b")
      .select(GraftFunctions.cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    got.zip(vecs).foreach { case (g, (a, b)) => assert(g == refCos(a, b)) }
  }

  test("CosineSimilarity interpreted path agrees with codegen path") {
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val got = vecs.toDF("a", "b")
        .select(GraftFunctions.cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
      got.zip(vecs).foreach { case (g, (a, b)) => assert(g == refCos(a, b)) }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null input propagates null; SQL registration works") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").collect()(0)
    assert(row.isNullAt(0))
    val ok = spark.sql(
      "SELECT graft_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))").collect()(0)
    assert(ok.getDouble(0) == 6.0)
  }
}

class TypedAggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("SumCountAvg typed aggregator equals built-in avg per key") {
    val ds = Seq(("X", 100.0), ("X", 200.0), ("Y", 50.0)).toDS()
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(TypedAggregators.SumCountAvg.toColumn.name("avg_val"))
      .collect().toMap
    assert(got == Map("X" -> 150.0, "Y" -> 50.0))
  }
}
