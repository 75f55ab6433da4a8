package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Maintenance contracts of the persisted signature / SRP indexes that
  * round 8 added storage sharding, the occupancy side table, and the
  * epoch fence for:
  *
  *  - the `occupancy/` side table (incrementally maintained so governed
  *    per-batch work is O(batch), never an O(index) band-table
  *    re-aggregate) must equal a from-scratch recomputation after ANY
  *    write/append/ingest/torn-heal sequence;
  *  - the epoch fence must fail loudly on the interleavings it exists to
  *    detect (stale claim, mid-flight mutation before a commit point);
  *  - the per-batch `ingest_stats/` audit sink must mirror the ledger
  *    exactly once, replays included.
  */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val p = Dedup.MinHashParams(numHashes = 32, bands = 8,
    shingle = 3, threshold = 0.2, maxBucket = 3)

  private def uniq(i: Long) =
    (0 until 8).map(j => s"unique${i}tok$j").mkString(" ")
  // one shared family so the tight maxBucket cap actually bites
  private def fam(i: Long) =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      s"kilo lima mike november oscar papa quebec romeo sierra tail$i"

  private def docs(ids: Long*): DataFrame =
    ids.map(i => i -> (if (i % 2 == 0) fam(i) else uniq(i)))
      .toDF("doc_id", "text")

  private def rmrf(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  /** The whole-table occupancy view vs a recomputation from the actual
    * bucket rows on disk — the invariant every incremental delta append
    * must preserve. */
  private def occupancyMatchesRecomputed(path: String, sub: String,
                                         keys: Seq[String]): Unit = {
    val side = Dedup.readOccupancy(spark, path, keys, None, Long.MaxValue)
      .collect().map(r => keys.indices.map(r.get(_)).toList ->
        r.getAs[Long]("__occ")).toMap
    val recomputed = spark.read.parquet(s"$path/$sub")
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .collect().map(r => keys.indices.map(r.get(_)).toList ->
        r.getAs[Long]("c")).toMap
    assert(side == recomputed,
      s"occupancy side table diverged from recomputed $sub counts: " +
        s"side-only=${side.toSet -- recomputed.toSet}, " +
        s"recomputed-only=${recomputed.toSet -- side.toSet}")
  }

  test("signature index occupancy equals recomputed after write, appends, " +
      "governed ingest, and a torn-append heal") {
    val base = Files.createTempDirectory("graft-occ-sig").toString
    val ix = s"$base/ix"; val out = s"$base/out"
    try {
      Dedup.writeSignatureIndex(docs(0L, 1L, 2L, 3L), "doc_id", "text", ix, p)
      occupancyMatchesRecomputed(ix, "bands", Seq("band", "bkey"))

      // two maintenance appends (the second one pushes the shared family
      // over the maxBucket cap, so capped rows must NOT be counted)
      Dedup.appendSignatureIndex(docs(10L, 11L, 12L), "doc_id", "text", ix)
      occupancyMatchesRecomputed(ix, "bands", Seq("band", "bkey"))
      Dedup.appendSignatureIndex(docs(20L, 21L, 22L), "doc_id", "text", ix)
      occupancyMatchesRecomputed(ix, "bands", Seq("band", "bkey"))

      // a governed batch through the exactly-once path
      Dedup.initIngestLedger(spark, ix)
      Dedup.ingestBatchWithIndex(docs(30L, 31L), "doc_id", "text", ix,
        out, batchId = 0L)
      occupancyMatchesRecomputed(ix, "bands", Seq("band", "bkey"))

      // torn attempt: signatures landed, bands + occupancy + ledger did
      // not — the healing replay must leave occupancy consistent too
      val torn = docs(40L, 41L)
      Dedup.withMinHashSignature(torn, "text", p)
        .select($"doc_id".as("id"), $"shingles",
          size($"shingles").as("sz"), $"minhash")
        .write.mode("append").parquet(s"$ix/signatures")
      Dedup.ingestBatchWithIndex(torn, "doc_id", "text", ix, out,
        batchId = 1L)
      occupancyMatchesRecomputed(ix, "bands", Seq("band", "bkey"))

      // a replay of the committed batch appends no second delta (the
      // governed path's shard+wm-pruned presence check skips it)
      val occBefore = spark.read.parquet(s"$ix/occupancy").count()
      Dedup.ingestBatchWithIndex(torn, "doc_id", "text", ix, out,
        batchId = 1L)
      assert(spark.read.parquet(s"$ix/occupancy").count() == occBefore,
        "replay must not append a second occupancy delta")
      occupancyMatchesRecomputed(ix, "bands", Seq("band", "bkey"))

      // compaction re-files the deltas without changing the counts (and
      // its defense-in-depth dropDuplicates leaves unique rows unique)
      Dedup.compactSignatureIndex(spark, ix, targetFileBytes = Long.MaxValue)
      occupancyMatchesRecomputed(ix, "bands", Seq("band", "bkey"))
      val occRows = spark.read.parquet(s"$ix/occupancy")
      assert(occRows.count() == occRows.dropDuplicates().count(),
        "occupancy delta rows must stay unique through compaction")
    } finally rmrf(base)
  }

  test("SRP index occupancy equals recomputed after write, append, and " +
      "governed embedding ingest") {
    val base = Files.createTempDirectory("graft-occ-srp").toString
    val ix = s"$base/ix"; val out = s"$base/out"
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(8)(rnd.nextGaussian().toFloat)
    def batch(ids: Long*) = ids.map(i => (i, vec())).toDF("vec_id", "v")
    try {
      Dedup.writeSrpIndex(batch(0L to 19L: _*), "vec_id", "v", ix, dim = 8)
      occupancyMatchesRecomputed(ix, "buckets", Seq("tbl", "bkt"))
      Dedup.appendSrpIndex(batch(30L, 31L, 32L), "vec_id", "v", ix)
      occupancyMatchesRecomputed(ix, "buckets", Seq("tbl", "bkt"))
      Dedup.initSrpIngestLedger(spark, ix)
      Dedup.ingestBatchWithSrpIndex(batch(40L, 41L), "vec_id", "v", ix,
        out, batchId = 0L, threshold = 0.9)
      occupancyMatchesRecomputed(ix, "buckets", Seq("tbl", "bkt"))
      Dedup.compactSrpIndex(spark, ix, targetFileBytes = Long.MaxValue)
      occupancyMatchesRecomputed(ix, "buckets", Seq("tbl", "bkt"))
    } finally rmrf(base)
  }

  test("epoch fence: stale claims and mid-flight mutations fail loudly") {
    val base = Files.createTempDirectory("graft-epoch").toString
    val ix = s"$base/ix"
    try {
      Dedup.writeSignatureIndex(docs(0L, 1L, 2L, 3L), "doc_id", "text", ix, p)
      val e0 = Dedup.indexEpoch(spark, ix)

      // a mutation claims the index; a second mutator holding the OLD
      // epoch must be rejected (the stale-claim half)
      val claimed = Dedup.advanceEpoch(spark, ix, e0)
      val stale = intercept[IllegalStateException] {
        Dedup.advanceEpoch(spark, ix, e0)
      }
      assert(stale.getMessage.contains("moved from epoch"))

      // the commit-point re-check: a mutation landing while a governed
      // batch is in flight makes the batch abort before its ledger row
      Dedup.advanceEpoch(spark, ix, claimed) // the interloper
      val midFlight = intercept[IllegalStateException] {
        Dedup.requireEpoch(spark, ix, claimed)
      }
      assert(midFlight.getMessage.contains("in flight") ||
        midFlight.getMessage.contains("moved"))

      // serialized mutators keep working: append after compaction after
      // append, each re-reading the epoch it claims
      Dedup.appendSignatureIndex(docs(10L, 11L), "doc_id", "text", ix)
      Dedup.compactSignatureIndex(spark, ix, targetFileBytes = Long.MaxValue)
      Dedup.appendSignatureIndex(docs(20L, 21L), "doc_id", "text", ix)
      val sigs = spark.read.parquet(s"$ix/signatures")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(sigs == Set(0L, 1L, 2L, 3L, 10L, 11L, 20L, 21L))
    } finally rmrf(base)
  }

  test("ingest stats sink mirrors the ledger exactly once, replay included") {
    val base = Files.createTempDirectory("graft-stats").toString
    val ix = s"$base/ix"; val out = s"$base/out"
    try {
      Dedup.writeSignatureIndex(docs(0L, 1L, 2L, 3L), "doc_id", "text", ix, p)
      Dedup.initIngestLedger(spark, ix)
      val s0 = Dedup.ingestBatchWithIndex(docs(10L, 11L), "doc_id", "text",
        ix, out, batchId = 0L)
      Dedup.appendIngestStats(spark, ix, s0)
      val s1 = Dedup.ingestBatchWithIndex(docs(20L, 21L, 22L), "doc_id",
        "text", ix, out, batchId = 1L)
      Dedup.appendIngestStats(spark, ix, s1)
      // the replay path: same batch id again (crash after ledger commit,
      // before the checkpoint advanced) — the stats append must be a no-op
      val s1r = Dedup.ingestBatchWithIndex(docs(20L, 21L, 22L), "doc_id",
        "text", ix, out, batchId = 1L)
      assert(s1r.replayed)
      Dedup.appendIngestStats(spark, ix, s1r)

      val stats = spark.read.parquet(s"$ix/ingest_stats")
        .orderBy($"batch_id").collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("batch_rows"),
          r.getAs[Long]("novel_rows"), r.getAs[Long]("watermark_before"),
          r.getAs[Long]("watermark_after")))
      val ledger = spark.read.parquet(s"$ix/ingest_ledger")
        .filter($"batch_id" >= 0L).orderBy($"batch_id").collect()
        .map(r => (r.getAs[Long]("batch_id"),
          r.getAs[Long]("watermark_before"),
          r.getAs[Long]("watermark_after"), r.getAs[Long]("novel_rows")))
      assert(stats.length == ledger.length,
        s"one stats row per committed batch: $stats vs $ledger")
      stats.zip(ledger).foreach { case (s, l) =>
        assert(s._1 == l._1 && s._4 == l._2 && s._5 == l._3 && s._3 == l._4,
          s"stats row $s diverges from ledger row $l")
      }
    } finally rmrf(base)
  }
}
