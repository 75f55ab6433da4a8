package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.sources.Tables

class EmbeddingLshSpec extends SparkSpec {

  /** Exact all-pairs baseline (no blocks): every pair with cosine >=
    * threshold, computed with the same codegen'd kernel and rounding as
    * the operator under test.
    */
  private def exactPairs(dir: String, threshold: Double): Set[(Long, Long)] = {
    val emb = Tables.embeddings(spark, dir)
    GraftFunctions.register(spark)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(GraftFunctions.cosineSim(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("embeddingNearDupLsh: precision 1.0 (every pair verified) and recall >= 0.7") {
    val dir = "/root/testdata/sf0.01"
    val want = exactPairs(dir, 0.4)
    assert(want.nonEmpty)
    val got = Dedup.embeddingNearDupLsh(Tables.embeddings(spark, dir),
      "vec_id", "embedding", threshold = 0.4, dim = 64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact-cosine verification makes false positives impossible
    assert(got.subsetOf(want), s"unverified pairs: ${got -- want}")
    val recall = (got & want).size.toDouble / want.size
    info(f"embeddingNearDupLsh recall vs exact all-pairs: $recall%.2f " +
      s"(${got.size}/${want.size})")
    assert(recall >= 0.7, f"recall $recall%.2f < 0.7")
  }

  test("scaled 8-plane config (d5c): precision 1.0, recall documented and floored") {
    // the corpus-density config trades per-table recall for 8x lower
    // bucket occupancy (BENCH_SF1.json): at cos 0.4, p ≈ 0.63 per plane,
    // p^8 ≈ 0.025 per table, 16 tables => ~0.33 expected recall. The
    // floor here gates against a BROKEN pipeline (recall collapsing to
    // ~0), not against the configured trade — raise `tables` when a
    // deployment needs both the density and the recall.
    val dir = "/root/testdata/sf0.01"
    val want = exactPairs(dir, 0.4)
    val got = Dedup.embeddingNearDupLsh(Tables.embeddings(spark, dir),
      "vec_id", "embedding", threshold = 0.4, dim = 64, planes = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(want), s"unverified pairs: ${got -- want}")
    val recall = (got & want).size.toDouble / want.size
    info(f"8-plane (d5c) recall vs exact all-pairs: $recall%.2f " +
      s"(${got.size}/${want.size})")
    assert(recall >= 0.15, f"recall $recall%.2f < 0.15 — pipeline broken")
  }

  test("embeddingNearDupLsh at a high threshold finds planted near-identical pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0 until 50).map(i => (i.toLong, vec()))
    // plant 5 near-identical copies (tiny perturbation => cosine ~ 1)
    val dups = (0 until 5).map { i =>
      val src = base(i)._2
      (100L + i, src.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupLsh(df, "vec_id", "embedding",
      threshold = 0.95, dim = 16, tables = 16, planes = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(planted.subsetOf(got),
      s"missed planted near-dups: ${planted -- got}")
  }
}
