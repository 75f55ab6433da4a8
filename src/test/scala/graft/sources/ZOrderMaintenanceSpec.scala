package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 hardening of the z-order layout lifecycle:
  *  - footer-stat boxes converted through Spark's `cast("long")`
  *    semantics (timestamp / decimal columns) so the incremental
  *    recluster's overlap probe works in the same units as the tail;
  *  - the fused NULL guard's nothing-lands contract under
  *    FileOutputCommitter algorithm v2;
  *  - batch-ledger folding (bounded metadata file count);
  *  - snapshot-consistent reads across maintenance commit windows
  *    (`readMaintained` / `withMaintainedRead` / `retryingRead`);
  *  - `rescueAside`, the one-call triage for unattributable asides.
  */
class ZOrderMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def rmrf(d: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete()
    }
    rec(new java.io.File(d))
  }

  private def bag(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupMapReduce(identity)(_ => 1)(_ + _)

  private def merge(a: Map[Seq[Any], Int], b: Map[Seq[Any], Int]) =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0) + b.getOrElse(k, 0))).toMap

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("footer boxes pass through cast semantics: an interleaved tail " +
      "on a TIMESTAMP-clustered layout finds its overlapping files " +
      "(stats are epoch-micros, the probe casts to seconds)") {
    val base = Files.createTempDirectory("graft-zmaint-ts").toString
    val lay = s"$base/lay"
    try {
      val t0 = 1700000000L
      val slice = spark.range(0, 4000).select(
        timestamp_seconds(lit(t0) + col("id") * 60).as("ts"),
        (col("id") % 500).as("k"),
        col("id").as("payload"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("ts", "k"),
        maxRecordsPerFile = 100L)
      var expected = bag(slice)

      // an IN-DOMAIN interleaved tail: same ts band as ids 1000..1200
      val tail = spark.range(0, 200).select(
        timestamp_seconds(lit(t0) + (col("id") + 1000) * 60).as("ts"),
        (col("id") % 500).as("k"),
        (col("id") + 100000).as("payload"))
      Layouts.appendZOrdered(tail, lay)
      expected = merge(expected, bag(tail))

      val st = Layouts.reclusterZOrderedIncremental(spark, lay)
      assert(!st.usedGlobal && st.tailFiles > 0, st)
      // the unit-mismatch failure mode: tail seconds fall outside the
      // micros-domain, the inDomain filter drops every tail row and
      // the pass "rewrites exactly itself" while files still
      // interleave in real key space — overlap MUST be found
      assert(st.overlappedFiles > 0,
        s"timestamp tail found no overlapping clustered files " +
          s"(footer stats read in the wrong unit?): $st")
      assert(st.untouchedFiles > 0, s"bounded pass was global-sized: $st")
      assert(Layouts.zOrderFragmentation(spark, lay) == 0.0)
      assert(bag(spark.read.parquet(lay)) == expected)
    } finally rmrf(base)
  }

  test("footer boxes pass through cast semantics: a BEYOND-DOMAIN tail " +
      "on a DECIMAL-clustered layout overlaps nothing (unscaled stats " +
      "would wrongly swallow it into the domain)") {
    val base = Files.createTempDirectory("graft-zmaint-dec").toString
    val lay = s"$base/lay"
    try {
      val slice = spark.range(0, 4000).select(
        (col("id") % 2000).cast("decimal(12,2)").as("d"),
        (col("id") % 37).as("k"),
        col("id").as("payload"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("d", "k"),
        maxRecordsPerFile = 100L)
      val cluBefore = spark.read
        .parquet(s"$lay/_zorder/clustered_files").count()
      var expected = bag(slice)

      // beyond the clustered domain in d: cast values 3000..3100 are
      // ABOVE the base max 1999 — but the UNSCALED int64-backed stats
      // run 0..199900, which would wrongly contain them and rewrite
      // innocent low-d files
      val tail = spark.range(0, 300).select(
        ((col("id") % 100) + 3000).cast("decimal(12,2)").as("d"),
        (col("id") % 37).as("k"),
        (col("id") + 100000).as("payload"))
      Layouts.appendZOrdered(tail, lay)
      expected = merge(expected, bag(tail))

      val st = Layouts.reclusterZOrderedIncremental(spark, lay)
      assert(!st.usedGlobal && st.tailFiles > 0, st)
      assert(st.overlappedFiles == 0,
        s"a beyond-domain decimal tail touched clustered files " +
          s"(footer stats read unscaled?): $st")
      assert(st.untouchedFiles == cluBefore, st)
      assert(Layouts.zOrderFragmentation(spark, lay) == 0.0)
      assert(bag(spark.read.parquet(lay)) == expected)
    } finally rmrf(base)
  }

  test("fused NULL guard lands nothing even under FileOutputCommitter " +
      "algorithm v2 (clean partitions must not commit before the " +
      "poisoned one aborts the job)") {
    val base = Files.createTempDirectory("graft-zmaint-v2").toString
    val lay = s"$base/lay"
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.algorithm.version"
    val prev = hc.get(key)
    try {
      val slice = spark.range(0, 1000).select(
        col("id").as("a"), (col("id") % 50).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("a", "b"))
      val rows0 = spark.read.parquet(lay).count()

      hc.set(key, "2")
      // 7 tiny clean partitions + one big poisoned partition whose
      // NULL row sorts LAST, so the clean tasks finish (and, under an
      // un-pinned v2, commit straight into the target) long before
      // the poisoned task aborts the job
      val big = spark.range(0, 300000)
        .select(lit(7L).as("part"), col("id"))
      val small = spark.range(0, 70)
        .select((col("id") % 7).as("part"), (col("id") + 1000000).as("id"))
      val poisoned = big.union(small)
        .repartition(8, col("part"))
        .sortWithinPartitions(col("id"))
        .select(
          when(col("id") === 299999L, lit(null: java.lang.Long))
            .otherwise(col("id")).as("a"),
          (col("id") % 50).as("b"), col("id").as("p"))
      val e = intercept[IllegalArgumentException] {
        Layouts.appendZOrdered(poisoned, lay)
      }
      assert(e.getMessage.contains("NULL"))
      assert(spark.read.parquet(lay).count() == rows0,
        "a partial batch landed under committer v2 — the guarded " +
          "write must pin algorithm v1")
    } finally {
      if (prev == null) hc.unset(key) else hc.set(key, prev)
      rmrf(base)
    }
  }

  test("ledger fold: fragmented batch-ledger files compact to one, " +
      "replays stay no-ops, the restamp carry compacts too") {
    val base = Files.createTempDirectory("graft-zmaint-ledger").toString
    val lay = s"$base/lay"
    def ledgerFiles: Int = fsOf(lay)
      .listStatus(new org.apache.hadoop.fs.Path(s"$lay/_zorder/ingested_batches"))
      .count { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    try {
      val mk = (lo: Long, hi: Long) => spark.range(lo, hi).select(
        col("id").as("a"), (col("id") % 50).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(mk(0, 500), lay, Seq("a", "b"))
      (0 until 8).foreach { b =>
        assert(Layouts.appendZOrderedExactlyOnce(
          mk(1000 + b * 10, 1010 + b * 10), lay, b))
      }
      assert(ledgerFiles >= 8, s"expected >=8 ledger files, got $ledgerFiles")
      val rows0 = spark.read.parquet(lay).count()

      Layouts.foldLedger(spark, lay, maxFiles = 5)
      assert(ledgerFiles == 1, s"fold left $ledgerFiles ledger files")
      // every committed batch id survives the fold: replays still no-op
      (0 until 8).foreach { b =>
        assert(!Layouts.appendZOrderedExactlyOnce(
          mk(1000 + b * 10, 1010 + b * 10), lay, b),
          s"batch $b re-landed after the fold")
      }
      assert(spark.read.parquet(lay).count() == rows0)
      // below-threshold fold is a no-op
      Layouts.foldLedger(spark, lay, maxFiles = 5)
      assert(ledgerFiles == 1)

      // the restamp carry (recluster) compacts instead of raw-copying
      (10 until 16).foreach { b =>
        assert(Layouts.appendZOrderedExactlyOnce(
          mk(2000 + b * 10, 2010 + b * 10), lay, b))
      }
      val rows1 = spark.read.parquet(lay).count()
      Layouts.reclusterZOrdered(spark, lay)
      assert(ledgerFiles == 1,
        s"restamp carried $ledgerFiles ledger files — the carry must fold")
      (10 until 16).foreach { b =>
        assert(!Layouts.appendZOrderedExactlyOnce(
          mk(2000 + b * 10, 2010 + b * 10), lay, b),
          s"batch $b re-landed after the recluster carry")
      }
      assert(spark.read.parquet(lay).count() == rows1)
    } finally rmrf(base)
  }

  test("fixed-schema contract behind the snapshot fast path: every data " +
      "file across the lifecycle embeds the SAME StructType, and the " +
      "fast-path schema equals inference's") {
    // readMaintained (and the r20 recluster reads) apply files.head's
    // embedded StructType to the whole snapshot — sound ONLY under the
    // layout's fixed-schema contract (appendGuard refuses mixed
    // schemas). This pins that contract across the full lifecycle, so
    // a future write path that lets a schema-divergent file in fails
    // HERE rather than silently projecting at read time.
    val base = Files.createTempDirectory("graft-zmaint-schema").toString
    val lay = s"$base/lay"
    try {
      val slice = spark.range(0, 2000).select(
        col("id").as("a"), (col("id") % 50).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("a", "b"),
        maxRecordsPerFile = 100L)
      Layouts.appendZOrdered(spark.range(0, 200).select(
        (col("id") + 5000).as("a"), (col("id") % 50).as("b"),
        (col("id") + 100000).as("p")), lay)
      Layouts.reclusterZOrderedIncremental(spark, lay)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = fsOf(lay)
      val dataFiles = fs.listStatus(new org.apache.hadoop.fs.Path(lay))
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .map(_.getPath.toString).toSeq
      assert(dataFiles.size > 1)
      // modulo NULLABILITY: the lifecycle legitimately mixes nullable
      // flags (a non-nullable source write vs the rewrite's re-read),
      // and Spark sanitizes — file sources force user read schemas to
      // nullable (probed: a non-nullable user schema still reads null
      // rows correctly), so names+types are the load-bearing contract
      val schemas = dataFiles
        .map(f => MetaIO.sparkFileSchema(conf, f).map(s =>
          org.apache.spark.sql.types.StructType(
            s.fields.map(_.copy(nullable = true))))).toSet
      assert(schemas.size == 1 && schemas.head.isDefined,
        s"lifecycle produced ${schemas.size} distinct embedded schemas — " +
          "the fast path's files.head projection would be unsound")
      // and the fast path agrees with what inference would say
      assert(Layouts.readMaintained(spark, lay).schema ==
        spark.read.parquet(dataFiles: _*).schema)
    } finally rmrf(base)
  }

  test("readMaintained resolves every manufactured incremental-commit " +
      "phase to ONE generation while a plain read double-counts the " +
      "move-in window") {
    val base = Files.createTempDirectory("graft-zmaint-snap").toString
    val lay = s"$base/lay"
    try {
      val slice = spark.range(0, 3000).select(
        col("id").as("a"), (col("id") % 100).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("a", "b"),
        maxRecordsPerFile = 100L)
      var expected = bag(slice)
      val tail = spark.range(0, 300).select(
        (col("id") + 1000).as("a"), (col("id") % 100).as("b"),
        (col("id") + 100000).as("p"))
      Layouts.appendZOrdered(tail, lay)
      expected = merge(expected, bag(tail))

      // manifest committed, nothing moved yet (phase 0)
      Layouts.reclusterZOrderedIncrementalImpl(spark, lay,
        maxRewriteFraction = 0.9, crashAfterManifest = true)
      val fs = fsOf(lay)
      def manNames(t: String): Seq[String] = spark.read
        .parquet(s"$lay/_zorder__inc/$t").collect().map(_.getString(0)).toSeq
      val newF = manNames("new_files")
      val consumed = manNames("consumed_files")
      assert(newF.nonEmpty && consumed.nonEmpty)
      assert(bag(Layouts.readMaintained(spark, lay)) == expected,
        "phase 0 (manifest only) must read the old generation")

      // phase 1: SOME new files moved in — plain read double-counts,
      // the snapshot still reads exactly the old generation
      val stage = new org.apache.hadoop.fs.Path(s"$lay/_zinc_stage")
      val root = new org.apache.hadoop.fs.Path(lay)
      val half = newF.take(math.max(1, newF.size / 2))
      half.foreach { n =>
        assert(fs.rename(new org.apache.hadoop.fs.Path(stage, n),
          new org.apache.hadoop.fs.Path(root, n)))
      }
      val plain = bag(spark.read.parquet(lay))
      assert(plain != expected && plain.values.sum > expected.values.sum,
        "expected the un-snapshot read to double-count mid-move-in")
      assert(bag(Layouts.readMaintained(spark, lay)) == expected,
        "phase 1 (partial move-in) must still read the old generation")

      // phase 2: ALL new files in, SOME consumed deleted — the
      // snapshot flips to the new generation
      newF.drop(half.size).foreach { n =>
        assert(fs.rename(new org.apache.hadoop.fs.Path(stage, n),
          new org.apache.hadoop.fs.Path(root, n)))
      }
      consumed.take(math.max(1, consumed.size / 2)).foreach { n =>
        fs.delete(new org.apache.hadoop.fs.Path(root, n), false)
      }
      assert(bag(Layouts.readMaintained(spark, lay)) == expected,
        "phase 2 (partial delete) must read the new generation")

      // the heal completes the commit; both read paths converge
      assert(Layouts.zOrderFragmentation(spark, lay) == 0.0)
      assert(bag(Layouts.readMaintained(spark, lay)) == expected)
      assert(bag(spark.read.parquet(lay)) == expected)
    } finally rmrf(base)
  }

  test("readMaintained across the APPEND commit window: a staged batch " +
      "is invisible until its files move in, a partial move-in reads " +
      "as an append-only prefix, and the heal completes the batch") {
    val base = Files.createTempDirectory("graft-zmaint-app").toString
    val lay = s"$base/lay"
    try {
      val slice = spark.range(0, 1000).select(
        col("id").as("a"), (col("id") % 40).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("a", "b"))
      val n0 = 1000L

      // stage a batch by hand in the exactly-once layout's own shape:
      // two data files in _zappend_stage plus the roll-forward manifest
      val fs = fsOf(lay)
      val mk = (lo: Long, hi: Long, name: String) => {
        spark.range(lo, hi).select(col("id").as("a"),
            (col("id") % 40).as("b"), col("id").as("p"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/tmp")
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/tmp"))
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .head.getPath
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$lay/_zappend_stage"))
        assert(fs.rename(part, new org.apache.hadoop.fs.Path(
          s"$lay/_zappend_stage/$name")))
        name
      }
      val f1 = mk(5000L, 5100L, "part-zapp-test-a.snappy.parquet")
      val f2 = mk(5100L, 5250L, "part-zapp-test-b.snappy.parquet")
      import spark.implicits._
      Seq(7L).toDF("batch_id").coalesce(1).write.mode("overwrite")
        .parquet(s"$lay/_zorder__app_tmp/batch")
      Seq(f1, f2).toDF("name").coalesce(1).write.mode("overwrite")
        .parquet(s"$lay/_zorder__app_tmp/new_files")
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$lay/_zorder__app_tmp"),
        new org.apache.hadoop.fs.Path(s"$lay/_zorder__app")))

      // manifest pending, nothing moved: the batch is invisible
      assert(Layouts.readMaintained(spark, lay).count() == n0,
        "a staged batch leaked into the snapshot before its commit")
      // partial move-in (crash mid-commit): append-only prefix
      assert(fs.rename(
        new org.apache.hadoop.fs.Path(s"$lay/_zappend_stage/$f1"),
        new org.apache.hadoop.fs.Path(s"$lay/$f1")))
      assert(Layouts.readMaintained(spark, lay).count() == n0 + 100L,
        "partial move-in must read as an append-only prefix")
      // any lifecycle call heals: the batch completes, the ledger holds it
      assert(Layouts.zOrderFragmentation(spark, lay) > 0.0)
      assert(Layouts.readMaintained(spark, lay).count() == n0 + 250L)
      // the healed batch id is committed: a replay is a no-op
      assert(!Layouts.appendZOrderedExactlyOnce(
        spark.range(5000L, 5250L).select(col("id").as("a"),
          (col("id") % 40).as("b"), col("id").as("p")), lay, 7L),
        "the healed batch must be ledgered against replays")
    } finally rmrf(base)
  }

  test("withMaintainedRead survives a GLOBAL recluster swap: a stale " +
      "plan fails with a retryable missing-file error and the retried " +
      "fresh snapshot returns the content-equivalent result") {
    val base = Files.createTempDirectory("graft-zmaint-retry").toString
    val lay = s"$base/lay"
    try {
      val slice = spark.range(0, 2000).select(
        col("id").as("a"), (col("id") % 100).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("a", "b"),
        maxRecordsPerFile = 200L)
      var expected = bag(slice)

      // plan a read BEFORE the swap (listing pinned at creation)
      val stale = Layouts.readMaintained(spark, lay)
      stale.count()

      val tail = spark.range(0, 500).select(
        (col("id") + 500).as("a"), (col("id") % 100).as("b"),
        (col("id") + 100000).as("p"))
      Layouts.appendZOrdered(tail, lay)
      expected = merge(expected, bag(tail))
      Layouts.reclusterZOrdered(spark, lay) // every file name changes

      // the stale plan's failure is CLASSIFIED as a retryable race
      val raced = intercept[Throwable] { stale.collect() }
      assert(Layouts.isMissingFileError(raced),
        s"stale-plan failure not classified retryable: $raced")

      // the reader discipline: first attempt races the swap (stale
      // plan), the retry's fresh snapshot wins
      var attempts = 0
      val got = Layouts.retryingRead(3) {
        attempts += 1
        if (attempts == 1) bag(stale.toDF())
        else bag(Layouts.readMaintained(spark, lay))
      }
      assert(attempts == 2, s"expected exactly one retry, got $attempts")
      assert(got == expected)

      // mid-swap instant (root absent, aside present): retryable;
      // a truly absent layout: permanent
      val fs = fsOf(lay)
      assert(fs.rename(new org.apache.hadoop.fs.Path(lay),
        new org.apache.hadoop.fs.Path(s"$lay.__zaside")))
      val midSwap = intercept[Throwable] {
        Layouts.readMaintained(spark, lay)
      }
      assert(Layouts.isMissingFileError(midSwap),
        s"mid-swap root-absent not classified retryable: $midSwap")
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$lay.__zaside"),
        new org.apache.hadoop.fs.Path(lay)))
      intercept[IllegalArgumentException] {
        Layouts.readMaintained(spark, s"$base/no-such-layout")
      }
      assert(bag(Layouts.readMaintained(spark, lay)) == expected)
    } finally rmrf(base)
  }

  test("a LIVE concurrent reader loop survives appends plus an " +
      "incremental and a global recluster with every result " +
      "content-consistent") {
    val base = Files.createTempDirectory("graft-zmaint-live").toString
    val lay = s"$base/lay"
    try {
      val slice = spark.range(0, 3000).select(
        col("id").as("a"), (col("id") % 100).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("a", "b"),
        maxRecordsPerFile = 100L)
      val n0 = 3000L
      val tailN = 400L
      // legal observations: the append window has append-only PREFIX
      // visibility (documented), so any count in [n0, n0+tailN] is a
      // valid snapshot while the append commits; after it, every
      // mutation is content-invariant, so only n0+tailN is valid. A
      // double-read across a recluster commit window would EXCEED
      // n0+tailN; a hole would dip below n0.

      @volatile var failure: Option[Throwable] = None
      val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      @volatile var stop = false
      val reader = new Thread(() => {
        try {
          while (!stop) {
            val c = Layouts.withMaintainedRead(spark, lay, attempts = 8) {
              df => df.count()
            }
            counts.add(c)
          }
        } catch { case t: Throwable => failure = Some(t) }
      })
      reader.start()
      try {
        val tail = spark.range(0, tailN).select(
          (col("id") + 700).as("a"), (col("id") % 100).as("b"),
          (col("id") + 100000).as("p"))
        Layouts.appendZOrdered(tail, lay)
        Layouts.reclusterZOrderedIncremental(spark, lay)
        Layouts.reclusterZOrdered(spark, lay)
      } finally {
        stop = true
        reader.join(120000)
      }
      assert(failure.isEmpty, s"live reader failed: $failure")
      val seen = counts.toArray(Array.empty[java.lang.Long]).map(_.longValue)
      assert(seen.nonEmpty, "reader loop never completed a read")
      val illegal = seen.filterNot(c => c >= n0 && c <= n0 + tailN)
      assert(illegal.isEmpty,
        s"reader observed non-snapshot counts ${illegal.toSeq.distinct} " +
          s"(legal range [$n0, ${n0 + tailN}]) — double-read or hole " +
          "across a commit window")
      assert(Layouts.withMaintainedRead(spark, lay)(_.count()) == n0 + tailN,
        "quiescent read must converge to the full content")
      info(s"live reader completed ${seen.length} reads across " +
        "append + incremental + global recluster")
    } finally rmrf(base)
  }

  test("rescueAside: the unattributable-aside remedy moves unowned " +
      "data files into the re-created root, drops the aside, and is " +
      "idempotent") {
    val base = Files.createTempDirectory("graft-zmaint-rescue").toString
    val lay = s"$base/lay"
    try {
      val gen1 = spark.range(0, 500).select(
        col("id").as("a"), (col("id") % 20).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(gen1, lay, Seq("a", "b"))
      val fs = fsOf(lay)
      // post-swap crash shape: the old generation is stranded as the
      // aside...
      assert(fs.rename(new org.apache.hadoop.fs.Path(lay),
        new org.apache.hadoop.fs.Path(s"$lay.__zaside")))
      // ...a late append is parked inside it...
      val late = spark.range(0, 50).select(
        (col("id") + 5000).as("a"), (col("id") % 20).as("b"),
        (col("id") + 900000).as("p"))
      late.coalesce(1).write.parquet(s"$base/late")
      val latePart = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/late"))
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .head.getPath
      assert(fs.rename(latePart, new org.apache.hadoop.fs.Path(
        s"$lay.__zaside/${latePart.getName}")))
      // ...and the operator re-creates the root (stamps consumed=Nil:
      // the aside becomes unattributable to any generation)
      val gen2 = spark.range(0, 300).select(
        (col("id") + 10000).as("a"), (col("id") % 20).as("b"),
        (col("id") + 500000).as("p"))
      Layouts.writeZOrderedMaintained(gen2, lay, Seq("a", "b"))

      // the heal must leave the aside (covered in ZOrderSpec); the
      // one-call remedy rescues everything unowned
      Layouts.zOrderFragmentation(spark, lay)
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$lay.__zaside")),
        "precondition: heal must not consume an unattributable aside")
      Layouts.rescueAside(spark, lay)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$lay.__zaside")),
        "aside must be dropped after the rescue")
      val want = merge(merge(bag(gen2), bag(gen1)), bag(late))
      assert(bag(spark.read.parquet(lay)) == want,
        "rescue must land the stranded generation and the late append")
      // idempotent: nothing to do, nothing changes
      Layouts.rescueAside(spark, lay)
      assert(bag(spark.read.parquet(lay)) == want)
      // the rescued files are ordinary unclustered appends: the next
      // recluster re-absorbs them
      Layouts.reclusterZOrdered(spark, lay)
      assert(bag(spark.read.parquet(lay)) == want)
      assert(Layouts.zOrderFragmentation(spark, lay) == 0.0)

      // the second unattributable shape: consumed_files UNREADABLE
      // (torn/corrupt record) rather than empty — the heal must still
      // refuse the aside, and the one-call rescue still resolves it
      val late2 = spark.range(0, 30).select(
        (col("id") + 9000).as("a"), (col("id") % 20).as("b"),
        (col("id") + 800000).as("p"))
      late2.coalesce(1).write.parquet(s"$base/late2")
      val late2Part = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$base/late2"))
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .head.getPath
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$lay.__zaside"))
      assert(fs.rename(late2Part, new org.apache.hadoop.fs.Path(
        s"$lay.__zaside/${late2Part.getName}")))
      val cfDir = new org.apache.hadoop.fs.Path(s"$lay/_zorder/consumed_files")
      fs.delete(cfDir, true)
      val out = fs.create(new org.apache.hadoop.fs.Path(cfDir, "part-garbage"))
      out.write("not parquet".getBytes("UTF-8")); out.close()
      Layouts.zOrderFragmentation(spark, lay) // heal: warn, leave aside
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$lay.__zaside")),
        "an unreadable consumed record must not let the heal drop the aside")
      Layouts.rescueAside(spark, lay)
      val want2 = merge(want, bag(late2))
      assert(bag(spark.read.parquet(lay)) == want2)
      // the next recluster restamps a CLEAN consumed record and
      // re-absorbs the rescued file
      Layouts.reclusterZOrdered(spark, lay)
      assert(bag(spark.read.parquet(lay)) == want2)
      assert(Layouts.zOrderFragmentation(spark, lay) == 0.0)
    } finally rmrf(base)
  }
}
