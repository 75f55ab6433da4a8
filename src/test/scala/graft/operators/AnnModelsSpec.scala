package graft.operators

import graft.SparkSpec
import graft.functions.AnnModels
import graft.sources.Tables

/** Drift guard for the frozen ANN model artifact: the generated
  * [[AnnModels]] constants must equal a FRESH run of the deterministic
  * trainers on the sf0.01 fixture — if either the trainers or the fixture
  * change, this fails and `graft.tools.TrainModels` must be re-run (and
  * the s3/s6/s7 oracle literals regenerate with it, since they derive
  * from the same constants).
  */
class AnnModelsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("frozen model shapes match the declared geometry") {
    assert(AnnModels.ivfCentroids.length == AnnModels.ivfC)
    assert(AnnModels.ivfCentroids.forall(_.length == AnnModels.dim))
    assert(AnnModels.pqCodebooks.length == AnnModels.pqM * AnnModels.pqK)
    assert(AnnModels.pqCodebooks.forall(_.length == AnnModels.pqSubDim))
  }

  test("frozen IVF centroids equal a fresh deterministic training run") {
    val fresh = Similarity.trainCentroids(Tables.embeddings(spark, dir),
      "vec_id", "embedding", c = AnnModels.ivfC, iters = 5)
    assert(fresh == AnnModels.ivfCentroids,
      "trainer or fixture drifted — re-run graft.tools.TrainModels")
  }

  test("frozen PQ codebooks equal a fresh deterministic training run") {
    val fresh = Similarity.trainPqCodebooks(Tables.embeddings(spark, dir),
      "vec_id", "embedding", m = AnnModels.pqM, k = AnnModels.pqK, iters = 5)
    assert(fresh == AnnModels.pqCodebooks,
      "trainer or fixture drifted — re-run graft.tools.TrainModels")
  }

  test("hash-prefiltered training sample (corpus > 4x maxTrain) is " +
      "deterministic and partitioning-independent") {
    val emb = Tables.embeddings(spark, dir) // 500 vectors at sf0.01
    // maxTrain=64 forces the hash-threshold branch (500 > 4*64 = 256);
    // the driver-side id sort must make the result independent of both
    // run order and the physical partitioning of the input
    val a = Similarity.trainCentroids(emb, "vec_id", "embedding",
      c = 8, iters = 3, maxTrain = 64)
    val b = Similarity.trainCentroids(emb.repartition(7), "vec_id",
      "embedding", c = 8, iters = 3, maxTrain = 64)
    assert(a == b, "hash-prefiltered sample must not depend on layout")
    val c1 = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 8, k = 8, iters = 3, maxTrain = 64)
    val c2 = Similarity.trainPqCodebooks(emb.repartition(3), "vec_id",
      "embedding", m = 8, k = 8, iters = 3, maxTrain = 64)
    assert(c1 == c2)
  }
}
