package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.AnnModels
import graft.operators.Similarity
import graft.sources.Tables

/** Streaming ANN serving over the persisted IVF layout
  * (`StreamOps.annServeStream`): per-batch results must equal the batch
  * probe over the same queries, restarts must not recompute or
  * duplicate (exactly-once without a ledger — pure function of a
  * read-only layout), and the PQ variant must serve the s9 pipeline.
  */
class AnnServeStreamSpec extends SparkSpec {

  private def queriesOf(lo: Long, hi: Long) =
    Tables.embeddings(spark, sf001)
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("served top-k equals the batch probe; a restart with no new queries is a no-op") {
    val emb = Tables.embeddings(spark, sf001)
    val base = Files.createTempDirectory("graft-ann-serve").toString
    val layout = s"$base/layout"
    Similarity.writeIvfLayout(emb, layout, "vec_id", "embedding",
      AnnModels.ivfCentroids)
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    val q0 = queriesOf(0, 5)
    q0.coalesce(1).write.parquet(in)
    val q = StreamOps.annServeStream(spark, in, q0.schema,
      "qid", "qvec", layout, out, cp, k = 5, nprobe = 8)
    q.processAllAvailable(); q.awaitTermination(120000)
    val want0 = Similarity.ivfTopKIndexed(spark, layout, q0,
      "qid", "qvec", k = 5, nprobe = 8, excludeSelf = false)
      .collect().map(_.toSeq).toSet
    def served() = spark.read.parquet(out).drop("batch_id")
      .collect().map(_.toSeq).toSet
    assert(served() == want0)
    assert(want0.nonEmpty)
    val batchDirs0 = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet

    // restart over the same checkpoint with no new queries: no new
    // batches, no recompute, output untouched
    val q2 = StreamOps.annServeStream(spark, in, q0.schema,
      "qid", "qvec", layout, out, cp, k = 5, nprobe = 8)
    q2.processAllAvailable(); q2.awaitTermination(120000)
    assert(served() == want0)

    // a late query file is served as its own batch, earlier results kept
    val q1 = queriesOf(5, 10)
    q1.coalesce(1).write.mode("append").parquet(in)
    val q3 = StreamOps.annServeStream(spark, in, q0.schema,
      "qid", "qvec", layout, out, cp, k = 5, nprobe = 8)
    q3.processAllAvailable(); q3.awaitTermination(120000)
    val wantAll = Similarity.ivfTopKIndexed(spark, layout,
      queriesOf(0, 10), "qid", "qvec", k = 5, nprobe = 8,
      excludeSelf = false)
      .collect().map(_.toSeq).toSet
    assert(served() == wantAll)
    val batchDirs1 = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(batchDirs0.subsetOf(batchDirs1) && batchDirs1.size > batchDirs0.size)
  }

  test("a takedown between batches reaches the NEXT batch of a live " +
      "stream — no restart: tombstones are re-read per micro-batch") {
    val emb = Tables.embeddings(spark, sf001)
    val base = Files.createTempDirectory("graft-ann-serve-del").toString
    val layout = s"$base/layout"
    Similarity.writeIvfLayout(emb, layout, "vec_id", "embedding",
      AnnModels.ivfCentroids)
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    val q0 = queriesOf(0, 5)
    q0.coalesce(1).write.parquet(in)
    // LIVE stream (processing-time trigger): it stays up across both
    // batches and the takedown in between
    val q = StreamOps.annServeStream(spark, in, q0.schema,
      "qid", "qvec", layout, out, cp, k = 5, nprobe = 8,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
    try {
      q.processAllAvailable()
      val batch0 = spark.read.parquet(out).drop("batch_id")
        .collect().map(_.toSeq).toSet
      assert(batch0.nonEmpty)

      // takedown: tombstone every id batch 0 served as a neighbor of
      // query 0 (its whole pre-delete top-k must churn)
      val victims = Similarity.ivfTopKIndexed(spark, layout, q0,
          "qid", "qvec", k = 5, nprobe = 8, excludeSelf = false)
        .filter(col("qid") === 0L).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSeq
      assert(victims.nonEmpty)
      Similarity.deleteFromIvfLayout(spark, layout, victims)

      // next batch on the SAME running stream
      val q1 = queriesOf(0, 1)
        .withColumn("qid", col("qid") + 1000L) // fresh qid, same vector
      q1.coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()

      val served1 = spark.read.parquet(out).drop("batch_id")
        .filter(col("qid") === 1000L).collect().map(_.toSeq).toSet
      assert(served1.nonEmpty, "second batch was not served")
      val servedIds = spark.read.parquet(out)
        .filter(col("qid") === 1000L).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
      assert(servedIds.intersect(victims.toSet).isEmpty,
        s"live stream served tombstoned ids: " +
          s"${servedIds.intersect(victims.toSet)}")
      // and it equals the batch probe over the POST-delete layout
      val want1 = Similarity.ivfTopKIndexed(spark, layout, q1,
        "qid", "qvec", k = 5, nprobe = 8, excludeSelf = false)
        .collect().map(_.toSeq).toSet
      assert(served1 == want1)
      // batch 0's already-served directory is history, untouched
      assert(spark.read.parquet(out).drop("batch_id")
        .filter(col("qid") =!= 1000L)
        .collect().map(_.toSeq).toSet == batch0)
    } finally q.stop()
  }

  test("a compaction between micro-batches of a LIVE stream: no " +
      "failure, and the next batch serves bit-identical to the batch " +
      "probe over the compacted layout") {
    val emb = Tables.embeddings(spark, sf001)
    val base = Files.createTempDirectory("graft-ann-serve-cmp").toString
    val layout = s"$base/layout"
    Similarity.writeIvfLayout(emb, layout, "vec_id", "embedding",
      AnnModels.ivfCentroids)
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    val q0 = queriesOf(0, 5)
    q0.coalesce(1).write.parquet(in)
    val q = StreamOps.annServeStream(spark, in, q0.schema,
      "qid", "qvec", layout, out, cp, k = 5, nprobe = 8,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
    try {
      q.processAllAvailable()
      val batch0 = spark.read.parquet(out).drop("batch_id")
        .collect().map(_.toSeq).toSet
      assert(batch0.nonEmpty)

      // give the compaction real work between batches: a takedown
      // (pending tombstones to purge) plus an append (fragmented cells
      // to fold), then the swap-heavy compact itself
      val victims = Similarity.ivfTopKIndexed(spark, layout, q0,
          "qid", "qvec", k = 5, nprobe = 8, excludeSelf = false)
        .filter(col("qid") === 0L).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSeq
      assert(victims.nonEmpty)
      Similarity.deleteFromIvfLayout(spark, layout, victims)
      val extra = Tables.embeddings(spark, sf001)
        .filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.appendIvfLayout(extra, layout)
      val purged = Similarity.compactIvfLayout(spark, layout,
        maxFilesPerCell = 1)
      assert(purged == victims.size.toLong, s"purged $purged")

      // next batch on the SAME running stream, after the swap
      val q1 = queriesOf(0, 1)
        .withColumn("qid", col("qid") + 2000L)
      q1.coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()

      val served1 = spark.read.parquet(out).drop("batch_id")
        .filter(col("qid") === 2000L).collect().map(_.toSeq).toSet
      assert(served1.nonEmpty, "post-compaction batch was not served")
      val want1 = Similarity.ivfTopKIndexed(spark, layout, q1,
        "qid", "qvec", k = 5, nprobe = 8, excludeSelf = false)
        .collect().map(_.toSeq).toSet
      assert(served1 == want1,
        "post-compaction serving diverged from the batch probe")
      // pre-compaction history untouched
      assert(spark.read.parquet(out).drop("batch_id")
        .filter(col("qid") < 2000L)
        .collect().map(_.toSeq).toSet == batch0)
    } finally q.stop()
  }

  test("retryOnMissingFiles: missing-file failures retry until the " +
      "body succeeds, other failures propagate, attempts exhaust") {
    var calls = 0
    val got = StreamOps.retryOnMissingFiles(3) {
      calls += 1
      if (calls < 3)
        throw new RuntimeException("wrapped",
          new java.io.FileNotFoundException("file part-0 does not exist"))
      42
    }
    assert(got == 42 && calls == 3)

    var calls2 = 0
    val e = intercept[IllegalStateException] {
      StreamOps.retryOnMissingFiles(3) {
        calls2 += 1
        throw new IllegalStateException("unrelated")
      }
    }
    assert(e.getMessage == "unrelated" && calls2 == 1,
      "non-missing failures must propagate immediately")

    var calls3 = 0
    intercept[java.io.FileNotFoundException] {
      StreamOps.retryOnMissingFiles(2) {
        calls3 += 1
        throw new java.io.FileNotFoundException("gone")
      }
    }
    assert(calls3 == 2, "attempts must exhaust, not loop")

    // PERMANENT failures whose message merely SAYS "does not exist"
    // (an absent layout/output root -> PATH_NOT_FOUND) must propagate
    // on the first attempt — retrying them with backoff sleeps delays
    // and mislabels the real error as a compaction race.
    var calls4 = 0
    intercept[Throwable] {
      StreamOps.retryOnMissingFiles(3) {
        calls4 += 1
        spark.read.parquet("/graft-no-such-layout-root").count()
      }
    }
    assert(calls4 == 1,
      "a permanent PATH_NOT_FOUND was retried as a missing-file race")
  }

  test("usePq serves the PQ-coded pipeline (ADC + exact re-rank)") {
    val emb = Tables.embeddings(spark, sf001)
    val base = Files.createTempDirectory("graft-ann-serve-pq").toString
    val layout = s"$base/layout"
    Similarity.writeIvfLayout(emb, layout, "vec_id", "embedding",
      AnnModels.ivfCentroids, AnnModels.pqCodebooks,
      pqM = AnnModels.pqM, pqK = AnnModels.pqK)
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    val q0 = queriesOf(0, 5)
    q0.coalesce(1).write.parquet(in)
    val q = StreamOps.annServeStream(spark, in, q0.schema,
      "qid", "qvec", layout, out, cp, k = 5, nprobe = 8,
      usePq = true, rerank = 20)
    q.processAllAvailable(); q.awaitTermination(120000)
    val want = Similarity.ivfPqTopKIndexed(spark, layout, q0,
      "qid", "qvec", topK = 5, nprobe = 8, rerank = 20,
      excludeSelf = false)
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(out).drop("batch_id")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
