package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins BOTH sampling regimes of the shared ANN training sample
  * (`Similarity.trainSample`, surfaced in the [[Similarity.trainCentroids]]
  * scaladoc):
  *
  *  - n ≤ 4·maxTrain — trains on exactly the lowest `maxTrain` ids;
  *  - n > 4·maxTrain — deterministic hash pre-filter
  *    (`pmod(hash(id), 2³⁰) < t`), then the lowest `maxTrain` surviving
  *    ids.
  *
  * Both regimes are RNG-free and reproducible; the boundary changes the
  * selected sample (the documented divergence), never the determinism.
  */
class TrainSampleRegimeSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vec(i: Long): Array[Float] = {
    val r = new scala.util.Random(i)
    Array.fill(dim)(r.nextFloat() * 2f - 1f)
  }
  private def emb(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, vec(i))).toDF("id", "v")

  test("small regime: trains on exactly the lowest maxTrain ids, " +
      "deterministic across runs and row orders") {
    val ids = 0L until 100L
    val corpus = emb(scala.util.Random.shuffle(ids.toList))
    val c1 = Similarity.trainCentroids(corpus, "id", "v", c = 4, iters = 3,
      maxTrain = 50)
    val c2 = Similarity.trainCentroids(emb(ids), "id", "v", c = 4,
      iters = 3, maxTrain = 50)
    assert(c1 == c2, "row order must not affect the trained model")
    val window = Similarity.trainCentroids(emb(0L until 50L), "id", "v",
      c = 4, iters = 3, maxTrain = 50)
    assert(c1 == window,
      "the small regime must equal training on the lowest-id window")
  }

  test("large regime: deterministic hash-pre-filtered window — " +
      "reproducible, equal to the manually pre-filtered corpus, and a " +
      "different sample than the unfiltered window") {
    val n = 500L
    val maxTrain = 50
    val corpus = emb(0L until n)
    val c1 = Similarity.trainCentroids(corpus, "id", "v", c = 4, iters = 3,
      maxTrain = maxTrain)
    val c2 = Similarity.trainCentroids(corpus, "id", "v", c = 4, iters = 3,
      maxTrain = maxTrain)
    assert(c1 == c2, "the large regime must be reproducible")

    // replicate the DOCUMENTED pre-filter by hand, take the lowest
    // maxTrain survivors, and train on exactly that subset
    val buckets = 1 << 30
    val t = math.max(1L, 4L * maxTrain * buckets / n)
    val lowestSurvivors = corpus
      .filter(pmod(hash(col("id")), lit(buckets)) < lit(t))
      .orderBy(col("id")).limit(maxTrain)
    assert(lowestSurvivors.count() == maxTrain.toLong, "fixture")
    val manual = Similarity.trainCentroids(lowestSurvivors, "id", "v",
      c = 4, iters = 3, maxTrain = maxTrain)
    assert(c1 == manual,
      "the large regime must equal the documented hash-filter + " +
        "lowest-id window")

    // the regimes genuinely select different samples past the boundary
    val window = Similarity.trainCentroids(emb(0L until maxTrain.toLong),
      "id", "v", c = 4, iters = 3, maxTrain = maxTrain)
    assert(c1 != window,
      "past 4*maxTrain the sample must be the filtered window (the " +
        "documented regime switch)")
  }

  test("trainPqCodebooks follows the same regime and stays deterministic " +
      "in both") {
    val small = emb(0L until 100L)
    val large = emb(0L until 500L)
    def pq(df: DataFrame) = Similarity.trainPqCodebooks(df, "id", "v",
      m = 2, k = 4, iters = 3, maxTrain = 50)
    assert(pq(small) == pq(small))
    assert(pq(large) == pq(large))
    assert(pq(small) != pq(large),
      "crossing the boundary changes the sample (documented)")
  }
}
