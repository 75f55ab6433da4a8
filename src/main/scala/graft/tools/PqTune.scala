package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.sources.Tables

/** Dev scratch: PQ recall grid over (m, k). */
object PqTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = Tables.table(spark, d, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec", k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (m <- Seq(8, 16); k <- Seq(16, 64); rr <- Seq(0, 20, 50)) {
      val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
        m = m, k = k, iters = 10)
      val approx = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        "qid", "qvec", topK = 5, books, m = m, k = k, rerank = rr)
        .select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact intersect approx).size.toDouble / exact.size
      println(f"m=$m%3d k=$k%4d rerank=$rr%3d recall@5=$recall%.3f")
    }
    spark.stop()
  }
}
