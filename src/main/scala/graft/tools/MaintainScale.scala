package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale audit for GOVERNED MAINTENANCE (the BENCH_SF10
  * `maintenance_audit` twin of [[DeleteScale]]): at a given SF, runs the
  * governed MinHash ingest loop the way `indexedDedupStream` wires it —
  * per-batch ingest, then the measured auto-compaction trigger — and
  * then the quarantine path, measuring what each maintenance mechanism
  * COSTS at scale:
  *
  *  - `autocompact_<i>`: the per-batch trigger probe (one flat directory
  *    listing) plus the compaction when it fires — the in-loop
  *    maintenance a long-running stream actually pays;
  *  - `batch_quarantined`: the whole-batch divert of a contract-violating
  *    batch (the raw rewrite + flagged ledger row, index untouched);
  *  - `redrive`: operator triage — re-ingesting the repaired rows
  *    through the full governed path and clearing the quarantine.
  *
  * Prints one JSON line per phase.
  * Usage: MaintainScale [sfDir] [workDir] [mode] [soakBatches]
  * mode = `sig` (default, MinHash family), `dig` (exact-digest
  * family twin — same phases through ingestBatchWithDigestIndex /
  * autoCompactDigestIndex / redriveQuarantinedDigest, so all three
  * governed families carry the same measured triage story), or `srp`
  * (embedding family over the embeddings table), or `soak` /
  * `soakdig` / `soaksrp` (r18; srp r19): the long-horizon depth
  * audit — ~200 governed batches (4th arg overrides) with the
  * autoCompact trigger after each, comparing per-batch wall time
  * early vs late in the stream's life (flat = per-batch cost is
  * independent of stream DEPTH, not just batch size). The three soak
  * families have different per-batch cost SHAPES (shard-pruned band
  * probes vs digest equi-join vs multi-probe SRP geometry), so each
  * carries its own depth row in BENCH_SF10.
  */
object MaintainScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_maintscale")
    val mode = args.lift(2).getOrElse("sig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def phase[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"maintain-scale","phase":"$label","sf_dir":"$dir","sec":$sec%.2f}""")
      r
    }

    val fsRoot = new org.apache.hadoop.fs.Path(work)
    fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fsRoot, true)
    val ix = s"$work/ix"; val out = s"$work/out"

    val Dd = graft.operators.Dedup
    val dig = mode == "dig" || mode == "soakdig"
    val srp = mode == "srp" || mode == "soaksrp"
    val soak = mode.startsWith("soak")
    val idCol = if (srp) "vec_id" else "doc_id"
    val docs = {
      if (srp) graft.sources.Tables.table(spark, dir, "embeddings")
      else {
        val docs0 = graft.sources.Tables.table(spark, dir, "documents")
        if (dig) docs0.withColumn("dg",
          sha2(substring(col("text"), 1, 30).cast("binary"), 256))
        else docs0
      }
    }
    val maxId = docs.agg(max(col(idCol))).head().getLong(0)
    val c0 = maxId * 3 / 5
    val p = Dd.MinHashParams(numHashes = 32, bands = 8,
      shingle = 3, threshold = 0.2)
    // family dispatch: one flow, three governed families
    def ingest(b: org.apache.spark.sql.DataFrame, id: Long,
               quarantine: Boolean = false): Unit =
      if (srp) Dd.ingestBatchWithSrpIndex(b, "vec_id", "embedding",
        ix, out, id, threshold = 0.4, quarantine)
      else if (dig) Dd.ingestBatchWithDigestIndex(b, "doc_id", "dg", ix,
        out, id, quarantine)
      else Dd.ingestBatchWithIndex(b, "doc_id", "text", ix, out, id,
        quarantine)
    def autoCompact(): Boolean =
      (if (srp) Dd.autoCompactSrpIndex(spark, ix)
       else if (dig) Dd.autoCompactDigestIndex(spark, ix)
       else Dd.autoCompactSignatureIndex(spark, ix)).isDefined
    phase("build") {
      if (srp) {
        Dd.writeSrpIndex(docs.filter(col("vec_id") <= c0),
          "vec_id", "embedding", ix, dim = 64)
        Dd.initSrpIngestLedger(spark, ix)
      } else if (dig) {
        Dd.writeDigestIndex(docs.filter(col("doc_id") <= c0),
          "doc_id", "dg", ix)
        Dd.initDigestIngestLedger(spark, ix)
      } else {
        Dd.writeSignatureIndex(docs.filter(col("doc_id") <= c0),
          "doc_id", "text", ix, p)
        Dd.initIngestLedger(spark, ix)
      }
    }

    // mode = soak / soakdig (r18): the long-horizon DEPTH audit. The
    // dozen-batch specs and the 4-batch flow below prove per-batch work
    // is O(batch) at the START of a stream's life; this drives ~200
    // governed batches (equal id-range slices of the remaining 40%,
    // autoCompact trigger after each — exactly indexedDedupStream's
    // wiring) and compares the per-batch wall time EARLY (batches
    // 5..15) vs LATE (last 10): flat = nothing per-batch grows with
    // stream depth (ledger reads, trigger probes, shard listings), the
    // claim a months-running 100 TB ingest loop rests on. One JSON line
    // with the full per-batch series plus the windowed summary.
    if (soak) {
      val n = args.lift(3).map(_.toInt).getOrElse(200)
      var sFired = 0
      val times = (0 until n).map { i =>
        val lo = c0 + (maxId - c0) * i / n
        val hi = c0 + (maxId - c0) * (i + 1) / n
        val t0 = System.nanoTime()
        ingest(docs.filter(col(idCol) > lo && col(idCol) <= hi),
          i.toLong)
        if (autoCompact()) sFired += 1
        val sec = (System.nanoTime() - t0) / 1e9
        if ((i + 1) % 25 == 0)
          System.err.println(f"[maintain-scale] soak batch ${i + 1}/$n " +
            f"$sec%.2f s (compactions so far: $sFired)")
        sec
      }
      def winMean(around: Int): Double = {
        val w = times.slice(math.max(0, around - 5),
          math.min(n, around + 5))
        w.sum / w.size
      }
      val early = winMean(10)
      val late = winMean(n - 5)
      def f2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(v))
      println(s"""{"tool":"maintain-scale","soak":{"mode":"$mode",""" +
        s""""sf_dir":"$dir","batches":$n,""" +
        s""""batch10_window_sec":${f2(early)},""" +
        s""""batch${n}_window_sec":${f2(late)},""" +
        s""""depth_ratio":${f2(late / early)},""" +
        s""""compactions_fired":$sFired,""" +
        s""""per_batch_sec":[${times.map(f2).mkString(",")}]}}""")
      spark.stop()
      return
    }

    // four governed batches over the remaining 40%, each followed by the
    // MEASURED auto-compaction trigger — exactly indexedDedupStream's
    // autoCompact wiring
    val batches = 4
    var fired = 0
    (0 until batches).foreach { i =>
      val lo = c0 + (maxId - c0) * i / batches
      val hi = c0 + (maxId - c0) * (i + 1) / batches
      phase(s"batch_$i") {
        ingest(docs.filter(col(idCol) > lo && col(idCol) <= hi),
          i.toLong)
      }
      phase(s"autocompact_$i") {
        if (autoCompact()) fired += 1
      }
    }
    println(s"""{"tool":"maintain-scale","compactions_fired":$fired,"batches":$batches}""")

    // quarantine path: a same-order-of-magnitude batch whose ids sit
    // BELOW the watermark (the contract violation) diverts whole...
    val bad = docs.filter(col(idCol) % 41 === 0 && col(idCol) <= c0)
    phase("batch_quarantined") {
      ingest(bad, batches.toLong, quarantine = true)
    }
    // ...and operator triage re-drives it through the full governed path
    // after an id repair (re-keyed past the watermark)
    val repair = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn(idCol, col(idCol) + lit(maxId + 1L))
    phase("redrive") {
      if (srp) Dd.redriveQuarantinedSrp(spark, ix, out,
        batches.toLong, "vec_id", "embedding", 0.4, repair)
      else if (dig) Dd.redriveQuarantinedDigest(spark, ix, out,
        batches.toLong, "doc_id", "dg", repair)
      else Dd.redriveQuarantined(spark, ix, out,
        batches.toLong, "doc_id", "text", repair)
    }
    // price the fold itself at this scale (what a trigger pays WHEN it
    // fires): a forced full compaction over the accreted batch file sets
    phase("compact_forced") {
      if (srp) Dd.compactSrpIndex(spark, ix)
      else if (dig) Dd.compactDigestIndex(spark, ix)
      else Dd.compactSignatureIndex(spark, ix)
    }
    spark.stop()
  }
}
