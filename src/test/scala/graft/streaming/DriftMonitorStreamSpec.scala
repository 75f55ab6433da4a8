package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** `StreamOps.driftMonitorStream` — the live observability twin of the
  * q56 batch snapshot drift: a matching-distribution batch must stay
  * quiet, a skewed batch must alert with the moved stratum carrying the
  * largest term, and a restart must replay nothing (exactly-once via
  * batch-id-named overwrite outputs, no ledger).
  */
class DriftMonitorStreamSpec extends SparkSpec {

  test("matching batch stays quiet; skewed batch alerts and localizes " +
      "the moved stratum; restart replays nothing") {
    val base = Files.createTempDirectory("graft-drift").toString
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    val docs = Tables.table(spark, sf001, "documents")
      .select(col("doc_id"), col("lang")).localCheckpoint()
    val refCounts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt")).localCheckpoint()
    val schema = docs.schema

    def run(): Unit = {
      val q = StreamOps.driftMonitorStream(spark, in, schema, "lang",
        refCounts, out, cp, tvAlert = 0.05)
      q.processAllAvailable()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }

    // batch 0: the reference corpus itself — identical distribution
    docs.coalesce(1).write.mode("append").parquet(in)
    run()
    val s0 = spark.read.parquet(s"$out/summary/batch=0").head()
    assert(s0.getAs[Long]("rows") == docs.count())
    assert(s0.getAs[Double]("tv") < 0.02, s"identical distribution: $s0")
    assert(!s0.getAs[Boolean]("alert"))

    // batch 1: a hard skew — every row lands in ONE language
    docs.withColumn("lang", lit("en")).coalesce(1)
      .write.mode("append").parquet(in)
    run()
    val s1 = spark.read.parquet(s"$out/summary/batch=1").head()
    assert(s1.getAs[Boolean]("alert"), s"skewed batch must alert: $s1")
    assert(s1.getAs[Double]("tv") > 0.05)
    // the per-key terms localize the move: 'en' gained the most mass
    val terms = spark.read.parquet(s"$out/terms/batch=1")
      .orderBy(col("tv_term").desc).collect()
    assert(terms.head.getAs[String]("lang") == "en")
    // languages that vanished from the batch still get finite terms
    // (Laplace smoothing — no dropped categories, no infinities)
    assert(terms.length == refCounts.count(),
      "every reference category must appear in the terms")
    assert(terms.forall(r => !r.getAs[Double]("kl_term").isInfinite))

    // restart on the same checkpoint: nothing new — outputs untouched
    val before = spark.read.parquet(s"$out/summary/*").count()
    run()
    assert(spark.read.parquet(s"$out/summary/*").count() == before)
    assert(before == 2)
  }
}
