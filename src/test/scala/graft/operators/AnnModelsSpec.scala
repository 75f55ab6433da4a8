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
}
