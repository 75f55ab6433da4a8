package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.AnnModels
import graft.sources.Tables

/** Mutation lifecycle of the persisted IVF serving layout
  * (`Similarity.appendIvfLayout` / `deleteFromIvfLayout` /
  * `compactIvfLayout`): appends under the frozen quantizer must equal a
  * rebuild bit-for-bit, takedowns must hide served vectors immediately
  * and purge them physically at compaction — rewriting ONLY the hit
  * `cell=K/` directories — and the swap crash windows must heal. The
  * lifecycle rides the dedup index family's shared core (tombstones,
  * epoch fence, scrub-marker swaps, format gate), so these specs also
  * pin that the reuse did not change layout probe semantics.
  */
class IvfLayoutLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf001

  private def rmrf(d: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete()
    }
    rec(new java.io.File(d))
  }

  private def emb = Tables.embeddings(spark, dir)

  private def queriesOf(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def probe(path: String) =
    Similarity.ivfTopKIndexed(spark, path, queriesOf(emb),
      "qid", "qvec", k = 5, nprobe = 8)
      .collect().map(_.toSeq).toSet

  test("append under the frozen quantizer equals a full rebuild, both probes") {
    val base = Files.createTempDirectory("graft-ivf-app").toString
    try {
      val full = s"$base/full"; val grown = s"$base/grown"
      Similarity.writeIvfLayout(emb, full, "vec_id", "embedding",
        AnnModels.ivfCentroids, AnnModels.pqCodebooks,
        pqM = AnnModels.pqM, pqK = AnnModels.pqK)
      Similarity.writeIvfLayout(emb.filter(col("vec_id") % 3 =!= 2),
        grown, "vec_id", "embedding",
        AnnModels.ivfCentroids, AnnModels.pqCodebooks,
        pqM = AnnModels.pqM, pqK = AnnModels.pqK)
      Similarity.appendIvfLayout(emb.filter(col("vec_id") % 3 === 2), grown)
      assert(probe(grown) == probe(full))
      // the PQ-coded ADC probe sees the appended rows under the stored
      // codebooks too (append must encode, not just land vectors)
      def pq(p: String) = Similarity.ivfPqTopKIndexed(spark, p,
        queriesOf(emb), "qid", "qvec", topK = 5, nprobe = 8, rerank = 50)
        .collect().map(_.toSeq).toSet
      assert(pq(grown) == pq(full))
    } finally rmrf(base)
  }

  test("takedown hides served vectors immediately; purge reclaims them " +
      "physically and rewrites ONLY the hit cell directories") {
    val base = Files.createTempDirectory("graft-ivf-del").toString
    try {
      val path = s"$base/ix"
      Similarity.writeIvfLayout(emb, path, "vec_id", "embedding",
        AnnModels.ivfCentroids)
      val victims = probe(path).map(_(1).asInstanceOf[Long])
        .filter(_ >= 10).take(3).toSeq
      assert(victims.nonEmpty)
      Similarity.deleteFromIvfLayout(spark, path, victims)
      // pending path: gone from the served results at the next open,
      // partition pruning intact
      val pending = probe(path)
      assert(pending.forall(r => !victims.contains(r(1).asInstanceOf[Long])))
      val plan = Similarity.ivfTopKIndexed(spark, path, queriesOf(emb),
        "qid", "qvec", k = 5, nprobe = 1)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"))
      // hit cells from the physical rows; snapshot a non-hit cell's files
      val rows = spark.read.parquet(s"$path/cells")
      val hitCells = rows.filter(col("vec_id").isin(victims: _*))
        .select("cell").distinct().as[Int].collect().toSet
      val coldCell = rows.select("cell").distinct().as[Int].collect()
        .filterNot(hitCells).head
      def filesOf(c: Int) =
        new java.io.File(s"$path/cells/cell=$c").listFiles()
          .filter(_.isFile).map(f => f.getName -> f.lastModified).toSet
      val coldBefore = filesOf(coldCell)
      val purged = Similarity.compactIvfLayout(spark, path)
      assert(purged == victims.size.toLong)
      // physically gone + tombstones folded + untouched cells untouched
      assert(spark.read.parquet(s"$path/cells")
        .filter(col("vec_id").isin(victims: _*)).isEmpty)
      assert(graft.operators.Dedup
        .listTombstoneFiles(spark, path).isEmpty)
      assert(filesOf(coldCell) == coldBefore)
      // purged probe == a layout rebuilt from the retained corpus
      val rebuilt = s"$base/rebuilt"
      Similarity.writeIvfLayout(
        emb.filter(!col("vec_id").isin(victims: _*)), rebuilt,
        "vec_id", "embedding", AnnModels.ivfCentroids)
      assert(probe(path) == probe(rebuilt))
      // idempotent re-run: nothing pending, nothing purged
      assert(Similarity.compactIvfLayout(spark, path) == 0L)
    } finally rmrf(base)
  }

  test("withServedProbe: a LIVE direct prober races a concurrent " +
      "compaction's cell swaps with no failure and bit-stable results " +
      "(the batch twin of annServeStream's no-quiesce contract)") {
    val base = Files.createTempDirectory("graft-ivf-serve").toString
    try {
      val path = s"$base/ix"
      // fragment every cell (10 appends) and tombstone some served
      // rows, so the compaction below rewrites/swaps MANY cell
      // directories while the reader hammers them
      val splits = (0 until 10).map(m => emb.filter(col("vec_id") % 10 === m))
      Similarity.writeIvfLayout(splits.head, path, "vec_id", "embedding",
        AnnModels.ivfCentroids)
      splits.tail.foreach(b => Similarity.appendIvfLayout(b, path))
      val victims = probe(path).map(_(1).asInstanceOf[Long])
        .filter(_ >= 10).take(3).toSeq
      assert(victims.nonEmpty)
      Similarity.deleteFromIvfLayout(spark, path, victims)
      // every legal observation — before, during, after the swaps — is
      // this exact set: pending tombstones are already hidden by the
      // probe's anti-join, and compaction is content-invariant
      val expected = probe(path)
      @volatile var stop = false
      @volatile var failure: Option[Throwable] = None
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
      val reader = new Thread(() => {
        try {
          while (!stop) results.add(
            Similarity.withServedProbe(attempts = 8)(probe(path)) == expected)
        } catch { case t: Throwable => failure = Some(t) }
      })
      reader.setName("ivf-live-prober")
      reader.start()
      try {
        // purge + fold EVERY cell directory (maxFilesPerCell = 1
        // forces a swap on each) — the widest window the layout has
        assert(Similarity.compactIvfLayout(spark, path,
          maxFilesPerCell = 1) == victims.size.toLong)
      } finally {
        stop = true
        reader.join(300000)
      }
      assert(failure.isEmpty, s"live prober failed: $failure")
      val seen = results.toArray(Array.empty[java.lang.Boolean])
      assert(seen.nonEmpty, "live prober never completed a read")
      assert(seen.forall(_.booleanValue), "a live probe observed a " +
        "result differing from the stable served set")
      // and the post-compaction direct probe still serves it
      assert(probe(path) == expected)
    } finally rmrf(base)
  }

  test("a fully-taken-down cell's directory is dropped at purge") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0f, 1f)), (4L, Seq(0.1f, 0.9f))
    ).toDF("id", "v")
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val base = Files.createTempDirectory("graft-ivf-empty").toString
    try {
      Similarity.writeIvfLayout(corpus, base, "id", "v", cents)
      Similarity.deleteFromIvfLayout(spark, base, Seq(3L, 4L)) // all of cell 1
      Similarity.compactIvfLayout(spark, base)
      assert(!new java.io.File(s"$base/cells/cell=1").exists())
      // probing toward the emptied cell returns nothing, cleanly
      val q = Seq((100L, Seq(0f, 1f))).toDF("qid", "qv")
      val got = Similarity.ivfTopKIndexed(spark, base, q, "qid", "qv",
        k = 2, nprobe = 1).collect()
      assert(got.isEmpty)
      // the other cell still serves
      val q0 = Seq((100L, Seq(1f, 0f))).toDF("qid", "qv")
      assert(Similarity.ivfTopKIndexed(spark, base, q0, "qid", "qv",
        k = 2, nprobe = 1).count() == 2)
    } finally rmrf(base)
  }

  test("compact on a layout whose EVERY cell was purged still folds a " +
      "later tombstone set instead of failing schema inference") {
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "v")
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val base = Files.createTempDirectory("graft-ivf-allpurged").toString
    try {
      Similarity.writeIvfLayout(corpus, base, "id", "v", cents)
      Similarity.deleteFromIvfLayout(spark, base, Seq(1L, 2L))
      assert(Similarity.compactIvfLayout(spark, base) == 2L)
      // no cell dirs remain; a tombstone for an id that was never there
      Similarity.deleteFromIvfLayout(spark, base, Seq(99L))
      assert(Similarity.compactIvfLayout(spark, base) == 0L)
      assert(graft.operators.Dedup.listTombstoneFiles(spark, base).isEmpty)
    } finally rmrf(base)
  }

  test("compaction folds append-fragmented cells; probe unchanged") {
    val base = Files.createTempDirectory("graft-ivf-frag").toString
    try {
      val splits = (0 until 10).map(m => emb.filter(col("vec_id") % 10 === m))
      Similarity.writeIvfLayout(splits.head, base, "vec_id", "embedding",
        AnnModels.ivfCentroids)
      splits.tail.foreach(Similarity.appendIvfLayout(_, base))
      val before = probe(base)
      val cellDirs = new java.io.File(s"$base/cells").listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("cell="))
      def dataFiles(d: java.io.File) = d.listFiles().count(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(cellDirs.exists(dataFiles(_) > 8), "fixture not fragmented")
      Similarity.compactIvfLayout(spark, base)
      assert(cellDirs.forall(d => !d.exists() || dataFiles(d) <= 8))
      assert(probe(base) == before)
    } finally rmrf(base)
  }

  test("a crashed cell swap heals at the next compact: stranded original " +
      "restored, orphaned temp dropped") {
    val base = Files.createTempDirectory("graft-ivf-heal").toString
    try {
      Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
        AnnModels.ivfCentroids)
      val before = probe(base)
      val cells = new java.io.File(s"$base/cells").listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("cell="))
      // crash A: after rename-aside, before the swap-in — the cell's
      // sole copy sits under the old-marker
      val a = cells(0)
      assert(a.renameTo(new java.io.File(a.getParent,
        "__scrub_old_" + a.getName)))
      // crash B: temp written, swap never started
      val b = cells(1)
      val tmp = new java.io.File(b.getParent, "__scrub_tmp_" + b.getName)
      assert(tmp.mkdir())
      assert(new java.io.File(tmp, "part-orphan.parquet").createNewFile())
      Similarity.compactIvfLayout(spark, base)
      assert(a.exists() && b.exists())
      assert(!tmp.exists())
      assert(!new java.io.File(a.getParent, "__scrub_old_" + a.getName).exists())
      assert(probe(base) == before)
    } finally rmrf(base)
  }

  test("rebuild over pending tombstones clears them (new generation serves " +
      "its full corpus)") {
    val base = Files.createTempDirectory("graft-ivf-rebuild").toString
    try {
      Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
        AnnModels.ivfCentroids)
      val victim = probe(base).map(_(1).asInstanceOf[Long])
        .filter(_ >= 10).head
      Similarity.deleteFromIvfLayout(spark, base, Seq(victim))
      Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
        AnnModels.ivfCentroids)
      assert(probe(base).exists(_(1).asInstanceOf[Long] == victim))
    } finally rmrf(base)
  }

  test("format gate: a future-version layout refuses loudly; a legacy " +
      "stamp-less params table reads as v1") {
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "v")
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val base = Files.createTempDirectory("graft-ivf-fmt").toString
    try {
      Similarity.writeIvfLayout(corpus, base, "id", "v", cents)
      val q = Seq((9L, Seq(1f, 0f))).toDF("qid", "qv")
      // legacy generation: params without the stamp (the pre-lifecycle
      // writer's layout) must open as v1
      val legacy = spark.read.parquet(s"$base/params")
        .drop("format_version")
      legacy.coalesce(1).write.mode("overwrite")
        .parquet(s"$base/params_legacy")
      rmrf(s"$base/params")
      spark.read.parquet(s"$base/params_legacy").coalesce(1)
        .write.mode("overwrite").parquet(s"$base/params")
      assert(Similarity.ivfTopKIndexed(spark, base, q, "qid", "qv",
        k = 1, nprobe = 1).count() == 1)
      // future generation: refuse with a migration message
      val future = spark.read.parquet(s"$base/params")
        .withColumn("format_version", lit(Dedup.IndexFormatVersion + 1))
      future.coalesce(1).write.mode("overwrite")
        .parquet(s"$base/params_future")
      rmrf(s"$base/params")
      spark.read.parquet(s"$base/params_future").coalesce(1)
        .write.mode("overwrite").parquet(s"$base/params")
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfTopKIndexed(spark, base, q, "qid", "qv",
          k = 1, nprobe = 1)
      }
      assert(e.getMessage.contains("format_version"))
    } finally rmrf(base)
  }

  test("membership registry: a registered cell dir invisible to the " +
      "probe throws retryable instead of serving a silently-short " +
      "candidate set; a registry-less layout serves the short view") {
    val base = Files.createTempDirectory("graft-ivf-members").toString
    val path = s"$base/ix"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    try {
      Similarity.writeIvfLayout(emb, path, "vec_id", "embedding",
        AnnModels.ivfCentroids)
      // probe EVERY cell so any hidden registered dir is in the
      // probed ∩ registered set the explicit-path read opens
      def probeAll() = Similarity.ivfTopKIndexed(spark, path,
        queriesOf(emb), "qid", "qvec", k = 5,
        nprobe = AnnModels.ivfCentroids.size)
        .collect().map(_.toSeq).toSet
      val expected = probeAll()
      assert(expected.nonEmpty)
      // the victim: the cell dir holding a SERVED neighbor, so hiding
      // it provably changes the result (the silent-hole contrast below)
      val servedId = expected.head(1).asInstanceOf[Long]
      val victim = "cell=" + spark.read.parquet(s"$path/cells")
        .filter(col("vec_id") === servedId).select(col("cell"))
        .head.getInt(0)
      val registered = Dedup.readMemberDirs(fs, path, "cells")
        .getOrElse(fail("a fresh layout must carry a members registry"))
      assert(registered.contains(victim))
      val vDir = hp(s"$path/cells/$victim")
      val hidden = hp(s"$path/cells/.hide-$victim")
      // hide the registered dir — the entry a racing readdir would
      // silently drop, or the instant inside compactIvfLayout's
      // per-cell rename swap. The probe must THROW retryable.
      assert(fs.rename(vDir, hidden))
      val raced = intercept[Throwable] { probeAll() }
      assert(graft.sources.Layouts.isMissingFileError(raced),
        s"registered-cell miss not classified retryable: $raced")
      // withServedProbe heals the transient form: first attempt races
      // the hide, the restore lands before the retry
      var attempts = 0
      val healed = Similarity.withServedProbe(attempts = 3) {
        attempts += 1
        if (attempts == 1) probeAll()
        else { assert(fs.rename(hidden, vDir) || fs.exists(vDir))
          probeAll() }
      }
      assert(attempts == 2, s"expected exactly one retry, got $attempts")
      assert(healed == expected)
      // CONTRAST (the hole the registry closes): strip the registry —
      // a pre-r19 layout — and hide the same dir; partition discovery
      // accepts the narrowed listing and serves a WRONG top-k with no
      // error for any retry contract to heal
      require(fs.delete(hp(s"$path/${Dedup.MembersSub}"), true))
      assert(fs.rename(vDir, hidden))
      val short = probeAll()
      assert(short != expected,
        "test setup: hiding a served cell must change the result")
      assert(fs.rename(hidden, vDir))
      Dedup.syncMemberDirs(spark, path, "cells", replace = true)
      assert(probeAll() == expected)
    } finally rmrf(base)
  }
}
