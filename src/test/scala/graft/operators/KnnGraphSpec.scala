package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.AnnModels
import graft.sources.Tables

/** Corpus k-NN graph (`Similarity.knnGraph`): the cell-blocked shuffle
  * self-join must (a) be EXACT when every cell is probed, (b) emit each
  * (query, neighbor) pair at most once with ≤ k ranked edges per query,
  * (c) hold a measured recall floor vs the exact graph at the default
  * probe fan, and (d) stay bounded under a hot cell via the maxCell cap.
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  test("exact when nprobe covers every cell (toy 2-cell corpus)") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.8f, 0.3f)),
      (4L, Seq(0f, 1f)), (5L, Seq(0.1f, 0.9f)), (6L, Seq(0.3f, 0.8f))
    ).toDF("id", "v")
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val graph = Similarity.knnGraph(corpus, "id", "v", k = 5, cents,
      nprobe = 2) // = all cells -> every pair is a candidate -> exact
      .collect().map(_.toSeq).toSet
    val exact = Similarity.bruteForceTopK(corpus,
      corpus.select(col("id").as("qid"), col("v").as("qv")),
      "id", "v", "qid", "qv", k = 5)
      .collect().map(_.toSeq).toSet
    assert(graph == exact)
    assert(graph.nonEmpty)
  }

  test("each pair meets at most once; at most k edges per query") {
    val emb = Tables.embeddings(spark, sf001)
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
      AnnModels.ivfCentroids, nprobe = 2).cache()
    try {
      assert(g.count() == g.select("qid", "vec_id").distinct().count())
      assert(g.groupBy("qid").count().agg(max("count")).head().getLong(0) <= 3)
      assert(g.filter(col("qid") === col("vec_id")).isEmpty)
    } finally g.unpersist()
  }

  test("recall >= 0.5 vs the exact graph at sf0.01, nprobe=8") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.bruteForceTopK(emb,
      emb.select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "vec_id", "embedding", "qid", "qv", k = 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5,
      AnnModels.ivfCentroids, nprobe = 8)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"knn graph recall vs exact top-5: $recall%.2f " +
      f"(${approx.size} edges, exact ${exact.size})")
    assert(recall >= 0.5, f"recall $recall%.2f < 0.5")
  }

  test("knnGraphAuto sizes the quantizer from the corpus and equals the " +
      "explicit composition") {
    val emb = Tables.embeddings(spark, sf001)
    val n = emb.count()
    val cells = math.min(n, math.min(
      Similarity.ivfCellsFor(n), 10000 / 4).toLong).toInt
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
      cells, iters = 5, maxTrain = 10000)
    val explicitG = Similarity.knnGraph(emb, "vec_id", "embedding",
      k = 3, cents, nprobe = 2).collect().map(_.toSeq).toSet
    val auto = Similarity.knnGraphAuto(emb, "vec_id", "embedding",
      k = 3, nprobe = 2).collect().map(_.toSeq).toSet
    assert(auto == explicitG)
    assert(auto.nonEmpty)
  }

  test("increment == rebuild bit-for-bit on the fixture corpus") {
    val emb = Tables.embeddings(spark, sf001)
    val cut = 400L
    val corpus = emb.filter(col("vec_id") < cut)
    val batch = emb.filter(col("vec_id") >= cut)
    assert(batch.count() > 0 && corpus.count() > 0)
    val old = Similarity.knnGraph(corpus, "vec_id", "embedding", k = 3,
      AnnModels.ivfCentroids, nprobe = 2)
    val inc = Similarity.knnGraphIncrement(old, corpus, batch,
      "vec_id", "embedding", k = 3, AnnModels.ivfCentroids, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val rebuilt = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
      AnnModels.ivfCentroids, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(inc == rebuilt)
    assert(inc.nonEmpty)
  }

  test("increment == rebuild UNDER the hot-cell cap (batch takes only the " +
      "slots the corpus left open)") {
    // one hot cell: corpus ids 0..9, batch ids 10..14, cap 12 -> the
    // union cap admits exactly batch ids 10 and 11 as neighbors
    val mk = (ids: Seq[Long]) =>
      ids.map(i => (i, Seq(1f, i.toFloat / 1000f))).toDF("id", "v")
    val corpus = mk(0L until 10L)
    val batch = mk(10L until 15L)
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val old = Similarity.knnGraph(corpus, "id", "v", k = 4, cents,
      nprobe = 1, maxCell = 12)
    val inc = Similarity.knnGraphIncrement(old, corpus, batch,
      "id", "v", k = 4, cents, nprobe = 1, maxCell = 12)
      .collect().map(_.toSeq).toSet
    val rebuilt = Similarity.knnGraph(corpus.union(batch), "id", "v",
      k = 4, cents, nprobe = 1, maxCell = 12)
      .collect().map(_.toSeq).toSet
    assert(inc == rebuilt)
    // the admitted neighbors really stop at the cap boundary
    assert(!inc.exists(_(1).asInstanceOf[Long] >= 12L))
    assert(inc.map(_(0).asInstanceOf[Long]) == (0L until 15L).toSet)
  }

  test("a non-monotone batch fails loudly") {
    val mk = (ids: Seq[Long]) =>
      ids.map(i => (i, Seq(1f, 0f))).toDF("id", "v")
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val corpus = mk(Seq(1L, 5L))
    val old = Similarity.knnGraph(corpus, "id", "v", k = 2, cents)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraphIncrement(old, corpus, mk(Seq(3L)),
        "id", "v", k = 2, cents)
    }
    assert(e.getMessage.contains("monotone"))
  }

  test("NULL batch ids fail loudly (all-NULL and partial-NULL both)") {
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f))).toDF("id", "v")
    val old = Similarity.knnGraph(corpus, "id", "v", k = 2, cents)
    // all-NULL ids: min(id) is SQL NULL — must be the contract message,
    // not a bare NPE from reading the null boolean
    val allNull = Seq((Option.empty[java.lang.Long], Seq(1f, 0f)))
      .toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.knnGraphIncrement(old, corpus, allNull, "id", "v",
        k = 2, cents)
    }
    assert(e1.getMessage.contains("NULL ids"), e1.getMessage)
    // partial NULL: min() ignores nulls so the monotone check alone
    // would pass — the count-parity check must still reject
    val partial = Seq((Option(java.lang.Long.valueOf(9L)), Seq(1f, 0f)),
      (Option.empty[java.lang.Long], Seq(0f, 1f))).toDF("id", "v")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.knnGraphIncrement(old, corpus, partial, "id", "v",
        k = 2, cents)
    }
    assert(e2.getMessage.contains("NULL ids"), e2.getMessage)
  }

  test("knnGraphIndexed over a layout equals knnGraph over the corpus; a " +
      "takedown drops BOTH edge directions") {
    val emb = Tables.embeddings(spark, sf001)
    val base = java.nio.file.Files
      .createTempDirectory("graft-knn-indexed").toString
    try {
      Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
        AnnModels.ivfCentroids)
      val live = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
        AnnModels.ivfCentroids, nprobe = 2).collect().map(_.toSeq).toSet
      val indexed = Similarity.knnGraphIndexed(spark, base, k = 3,
        nprobe = 2).collect().map(_.toSeq).toSet
      assert(indexed == live)
      val victims = Seq(0L, 17L, 230L)
      Similarity.deleteFromIvfLayout(spark, base, victims)
      val after = Similarity.knnGraphIndexed(spark, base, k = 3,
        nprobe = 2).collect().map(_.toSeq).toSet
      val retained = Similarity.knnGraph(
        emb.filter(!col("vec_id").isin(victims: _*)),
        "vec_id", "embedding", k = 3, AnnModels.ivfCentroids, nprobe = 2)
        .collect().map(_.toSeq).toSet
      assert(after == retained)
      assert(!after.exists(r => victims.contains(r(0).asInstanceOf[Long]) ||
        victims.contains(r(1).asInstanceOf[Long])))
    } finally {
      def rec(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rec)
        f.delete()
      }
      rec(new java.io.File(base))
    }
  }

  test("randomized increment == rebuild: random vectors, random split " +
      "point, random cap (20 trials, fixed seed)") {
    val rnd = new scala.util.Random(421)
    val cents: Seq[Seq[Float]] =
      Seq(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f), Seq(0f, 0f, 1f),
        Seq(0.6f, 0.6f, 0.5f))
    (0 until 20).foreach { trial =>
      val n = 12 + rnd.nextInt(28)
      val rows = (0L until n.toLong).map { i =>
        (i, Seq.fill(3)(rnd.nextFloat() * 2f - 1f))
      }
      val df = rows.toDF("id", "v")
      val cut = 1 + rnd.nextInt(n - 1)
      val corpus = df.filter(col("id") < cut)
      val batch = df.filter(col("id") >= cut)
      val k = 1 + rnd.nextInt(4)
      val nprobe = 1 + rnd.nextInt(cents.length)
      val cap = 2 + rnd.nextInt(12) // often binding on hot cells
      val old = Similarity.knnGraph(corpus, "id", "v", k, cents,
        nprobe, cap)
      val inc = Similarity.knnGraphIncrement(old, corpus, batch,
        "id", "v", k, cents, nprobe, cap)
        .collect().map(_.toSeq).toSet
      val rebuilt = Similarity.knnGraph(df, "id", "v", k, cents,
        nprobe, cap).collect().map(_.toSeq).toSet
      assert(inc == rebuilt,
        s"trial $trial: n=$n cut=$cut k=$k nprobe=$nprobe cap=$cap")
    }
  }

  test("maxCell caps a hot cell's corpus side in stable id order") {
    // all 40 vectors collapse into cell 0; cap 10 -> only ids 0..9 can be
    // NEIGHBORS (the probe side is never capped: every vector still asks)
    val corpus = (0L until 40L).map(i => (i, Seq(1f, i.toFloat / 1000f)))
      .toDF("id", "v")
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val g = Similarity.knnGraph(corpus, "id", "v", k = 3, cents,
      nprobe = 1, maxCell = 10).cache()
    try {
      assert(g.agg(max(col("id"))).head().getLong(0) <= 9L)
      assert(g.select("qid").distinct().count() == 40L)
      assert(g.groupBy("qid").count().agg(max("count")).head().getLong(0) <= 3)
    } finally g.unpersist()
  }
}
