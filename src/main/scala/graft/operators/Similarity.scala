package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`) — north-star tier (SURVEY.md §2.3).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline. The (small) query set is
  *    broadcast, so the corpus is scanned once with no corpus shuffle; the
  *    per-query ranking shuffles only (qid, corpus_id, sim) triples.
  *  - [[lshTopK]]: scale path. Sign-random-projection bucketing — each
  *    vector reduces to a small integer bucket; queries probe only their
  *    bucket, turning the cross product into a hash join on bucket id.
  *
  * The cosine kernel is the codegen'd native expression
  * ([[graft.functions.CosineSimilarity]]), not a UDF or higher-order
  * function — this is the hot loop at 100 TB.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) — the big side, scanned once
    * @param queries (qidCol, qvecCol) — small, broadcast to every task
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String,
                     qidCol: String, qvecCol: String,
                     k: Int, excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val joined = corpus.crossJoin(broadcast(queries))
    val withSim = joined
      .withColumn("sim", round(GraftFunctions.cosineSim(col(vecCol), col(qvecCol)), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(idCol) =!= col(qidCol)) else withSim
    rankTopK(filtered, idCol, qidCol, k)
  }

  /** Per-query ranking via the bounded TopKByScore aggregate (NOT a window
    * function): each map task reduces its partition to ≤ k pairs per query
    * before the shuffle, so the exchange carries O(k × partitions) rows per
    * query instead of the whole candidate set. Output matches the window
    * formulation bit-for-bit: rank by (sim DESC, id ASC), rank ≤ k.
    */
  private def rankTopK(withSim: DataFrame, idCol: String, qidCol: String,
                       k: Int): DataFrame =
    withSim
      .groupBy(col(qidCol))
      .agg(GraftFunctions.topK(col("sim"), col(idCol), k).as("tk"))
      .select(col(qidCol), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col(qidCol), col("p.id").as(idCol), col("p.score").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col(qidCol), col("rank"))

  /** Number of random hyperplanes for [[lshTopK]] bucketing (bucket space
    * 2^planes). */
  val DefaultPlanes = 12

  /** Deterministic pseudo-random hyperplanes, seed fixed — same planes on
    * every run and every executor (they are literal arrays in the plan).
    */
  private def hyperplanes(planes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextDouble() * 2.0 - 1.0))
  }

  /** Sign-random-projection bucket id of a vector column. */
  def srpBucket(vec: Column, planes: Int, dim: Int): Column = {
    val hs = hyperplanes(planes, dim)
    val bits = hs.zipWithIndex.map { case (plane, j) =>
      val dot = aggregate(
        zip_with(vec, typedLit(plane), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: queries probe only the corpus bucket matching their
    * own SRP signature. Recall < 1 by construction (that is the trade);
    * at 100 TB the corpus side is bucketed once (narrow scan + small
    * shuffle on bucket id) instead of a full cross product.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String,
              qidCol: String, qvecCol: String,
              k: Int, dim: Int, planes: Int = DefaultPlanes,
              excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cb = corpus.withColumn("bucket", srpBucket(col(vecCol), planes, dim))
    val qb = queries.withColumn("bucket", srpBucket(col(qvecCol), planes, dim))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
    val withSim = joined
      .withColumn("sim", round(GraftFunctions.cosineSim(col(vecCol), col(qvecCol)), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(idCol) =!= col(qidCol)) else withSim
    rankTopK(filtered, idCol, qidCol, k)
  }
}
