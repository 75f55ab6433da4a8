package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Dev-only scratch probe (not part of the library surface). */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count()

    time("tokenHashes only") {
      println(docs.select(tokenHashes(col("text")).as("th")).selectExpr("sum(size(th))").collect().mkString)
    }
    time("hashedShingleSet") {
      println(docs.select(hashedShingleSet(col("text"), 3).as("sh")).selectExpr("sum(size(sh))").collect().mkString)
    }
    time("string shingleSet") {
      println(docs.select(shingleSet(col("text"), 3).as("sh")).selectExpr("sum(size(sh))").collect().mkString)
    }
    time("xxhash over string shingles") {
      println(docs.select(transform(shingleSet(col("text"), 3), s => xxhash64(s)).as("sh"))
        .selectExpr("sum(size(sh))").collect().mkString)
    }
    val withSets = docs
      .withColumn("sh", hashedShingleSet(col("text"), 3))
      .select(col("lang"), col("doc_id"), col("sh"), size(col("sh")).as("sz"))
    time("cache sets") { withSets.cache().count() }
    val a = withSets.select(col("lang"), col("doc_id").as("id_a"), col("sh").as("sh_a"), col("sz").as("sz_a"))
    val b = withSets.select(col("lang"), col("doc_id").as("id_b"), col("sh").as("sh_b"), col("sz").as("sz_b"))
    time("pairwise jaccard from cached sets") {
      val j = a.join(b, Seq("lang"))
        .filter(col("id_a") < col("id_b") &&
          col("sz_a") * lit(0.2) <= col("sz_b") && col("sz_b") * lit(0.2) <= col("sz_a"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
        .filter(col("jaccard") >= 0.2)
      println("pairs=" + j.count())
    }
    time("full d3 op uncached") {
      println(Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq(col("lang")), 3, 0.2).count())
    }
    spark.stop()
  }
}
