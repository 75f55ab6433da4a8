package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.sources.Tables

class PqSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("pqEncode picks the L2-nearest centroid per subspace, ties low") {
    // m=2 subspaces of 2 dims, k=2 centroids each (row-major by subspace)
    val books: Seq[Seq[Float]] = Seq(
      Seq(0f, 0f), Seq(10f, 10f),   // subspace 0
      Seq(0f, 5f), Seq(0f, -5f))    // subspace 1
    val df = Seq(
      (1L, Seq(1f, 1f, 0f, 4f)),    // sub0 -> c0, sub1 -> c0
      (2L, Seq(9f, 9f, 0f, -4f)),   // sub0 -> c1, sub1 -> c1
      (3L, Seq(5f, 5f, 0f, 0f))     // both equidistant -> lower id wins
    ).toDF("id", "v")
    val got = df.select(col("id"),
      GraftFunctions.pqEncode(col("v"), books, 2, 2).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(0, 0))
    assert(got(2L) == Seq(1, 1))
    assert(got(3L) == Seq(0, 0))
  }

  test("pqAdc equals cosine of the reconstruction, hand-computed") {
    val books: Seq[Seq[Float]] = Seq(
      Seq(1f, 0f), Seq(0f, 1f),     // subspace 0
      Seq(2f, 0f), Seq(0f, 2f))     // subspace 1
    val df = Seq((Seq(0, 1), Seq(1f, 1f, 1f, 1f))).toDF("codes", "q")
    val got = df.select(
      GraftFunctions.pqAdc(col("codes"), col("q"), books, 2, 2).as("sim"))
      .collect().head.getDouble(0)
    // reconstruction = [1,0, 0,2]; q = [1,1,1,1]
    val expect = (1.0 + 0.0 + 0.0 + 2.0) /
      (math.sqrt(1.0 + 4.0) * math.sqrt(4.0))
    assert(math.abs(got - expect) < 1e-12)
  }

  test("pq top-k recall vs the exact baseline on the fixture embeddings") {
    val emb = Tables.table(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec", k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 16, k = 16, iters = 5)
    def recallOf(rerank: Int): Double = {
      val approx = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        "qid", "qvec", topK = 5, books, m = 16, k = 16, rerank = rerank)
        .select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    // pure ADC on the near-random 64-dim fixture: compression alone keeps
    // only coarse ranking signal (measured 0.36 at 16x16)
    val adcOnly = recallOf(0)
    info(f"PQ ADC-only recall@5 = $adcOnly%.2f (16x16 codebook)")
    assert(adcOnly >= 0.25, s"ADC recall collapsed: $adcOnly")
    // ADC shortlist-50 + exact re-rank: the production two-stage shape
    // (measured 0.98)
    val reranked = recallOf(50)
    info(f"PQ rerank-50 recall@5 = $reranked%.2f")
    assert(reranked >= 0.8, s"re-ranked recall collapsed: $reranked")
  }

  test("ivf-pq composition recall vs the exact baseline") {
    val emb = Tables.table(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec", k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      c = 32, iters = 5)
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 16, k = 16, iters = 5)
    val approx = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      "qid", "qvec", topK = 5, cents, nprobe = 8, books, m = 16, k = 16,
      rerank = 50)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF-PQ recall@5 = $recall%.2f (32 cells nprobe 8, 16x16 PQ, rerank 50)")
    // bounded above by IVF's candidate recall (~0.78 at nprobe=8)
    assert(recall >= 0.5, s"IVF-PQ recall collapsed: $recall")
  }

  test("codebook trainer is deterministic and correctly shaped") {
    val emb = Tables.table(spark, sf001, "embeddings")
    val b1 = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8)
    val b2 = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8)
    assert(b1 == b2)
    assert(b1.length == 4 * 8)
    assert(b1.forall(_.length == 16))   // 64 dims / 4 subspaces
  }
}

class TokenEntropySpec extends SparkSpec {
  import spark.implicits._

  test("tokenEntropy equals the naive per-doc computation on random docs") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ffff")
    val docs = (1 to 200).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val naive = docs.map { case (id, text) =>
      val tok = text.split(" ", -1)
      val counts = tok.groupBy(identity).view.mapValues(_.length.toDouble)
      val n = tok.length.toDouble
      val h = math.log(n) - counts.values.map(c => c * math.log(c)).sum / n
      id -> (tok.length.toLong, counts.size.toLong, r6(h),
        if (n > 1) r6(h / math.log(n)) else 0.0)
    }.toMap
    val got = TextOps.tokenEntropy(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == naive)
  }

  test("gopherRules top-word share equals the naive maximum multiplicity " +
    "on random docs") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("the", "cat", "dog", "runs", "fast", "a")
    val docs = (1 to 200).map { i =>
      val n = 1 + rnd.nextInt(60)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val naive = docs.map { case (id, text) =>
      val tok = text.split(" ", -1)
      id -> r6(tok.groupBy(identity).values.map(_.length).max.toDouble / tok.length)
    }.toMap
    val got = TextOps.gopherRules(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("top_word_frac")).toMap
    assert(got == naive)
  }

  test("runStats kernel handles empty arrays and null elements") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq[String]()),                         // empty -> all zeros
      (2L, Seq("x", null, "x", null))              // nulls group as one run
    ).toDF("id", "tok")
    val got = df.select(col("id"),
      GraftFunctions.runStats(col("tok")).as("m"))
      .select(col("id"), col("m.n_tokens"), col("m.n_distinct"),
        col("m.top_count"), col("m.sum_c_ln_c"))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toMap
    assert(got(1L) == ((0L, 0L, 0L, 0.0)))
    val two = 2.0 * math.log(2.0)
    assert(got(2L) == ((4L, 2L, 2L, two + two)))
  }

  test("tokenEntropy matches the closed form on hand-built docs") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val docs = Seq(
      (1L, "a a a a"),          // one run: H = 0
      (2L, "a b c d"),          // uniform: H = ln 4, norm 1
      (3L, "a a b"),            // H = ln3 - (2 ln2)/3
      (4L, "")                  // split -> [""]: n=1, H=0
    ).toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((4L, 1L, 0.0, 0.0)))
    assert(got(2L)._1 == 4L && got(2L)._2 == 4L)
    assert(got(2L)._3 == r6(math.log(4)) && got(2L)._4 == 1.0)
    val h3 = math.log(3) - 2.0 * math.log(2.0) / 3.0
    assert(got(3L)._2 == 2L)
    assert(got(3L)._3 == r6(h3))
    assert(got(3L)._4 == r6(h3 / math.log(3)))
    assert(got(4L) == ((1L, 1L, 0.0, 0.0)))
  }
}
