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
