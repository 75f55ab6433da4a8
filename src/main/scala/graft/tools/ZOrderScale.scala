package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale audit for the z-order layout lifecycle (BENCH_SF10
  * `zorder_audit`): at a given SF, prices every lifecycle phase so the
  * 100x behavior is measured, not argued —
  *
  *  - `clustered_write`: writeZOrderedMaintained over the corpus slice
  *    (the generation rewrite every layout pays once).
  *  - `append`: the cheap ingest path — one plain parquet write, no
  *    range exchange (the claim: ingest cost tracks the batch).
  *  - `frag_probe`: zOrderFragmentation — a directory listing, never a
  *    data scan (the claim: the trigger is priced in milliseconds at
  *    any corpus size, so it can run on every maintenance tick).
  *  - `recluster_incremental`: the measured trigger driving the BOUNDED
  *    pass on a beyond-domain tail — rewrite = exactly the tail.
  *  - `append_indomain` + `recluster_incremental_overlap`: an in-domain
  *    tail, pricing the footer-stats overlap probe and the bounded
  *    tail+overlap rewrite (the LSM claim: cost tracks the fragmented
  *    fraction, not the corpus).
  *  - `recluster_global`: the whole-corpus rewrite the incremental pass
  *    replaces — the baseline it must beat.
  *  - `serve_append`/`serve_recluster_incremental`/
  *    `serve_recluster_global` + the `serve_while_maintain` info line:
  *    the same mutations re-priced WITH a live concurrent reader loop
  *    on the snapshot contract (`withMaintainedRead`) — the no-quiesce
  *    claim measured: reads never fail, never double-read, never hole.
  *  - `post_read`: the q64c-shape filtered read after maintenance.
  *
  * Prints one JSON line per phase. Usage: ZOrderScale [sfDir] [work]
  */
object ZOrderScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_zorderscale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def phase[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"zorder-scale","phase":"$label","sf_dir":"$dir","sec":$sec%.3f}""")
      r
    }

    val L = graft.sources.Layouts
    val lay = s"$work/lay"
    val fsRoot = new org.apache.hadoop.fs.Path(work)
    fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fsRoot, true)
    val li = graft.sources.Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
      .localCheckpoint() // price the lifecycle, not the source scan
    val maxKey = li.agg(max(col("l_orderkey"))).head().getLong(0)
    val cut = maxKey * 3 / 5

    phase("clustered_write") {
      L.writeZOrderedMaintained(li.filter(col("l_orderkey") <= cut), lay,
        Seq("l_orderkey", "l_partkey"))
    }
    // beyond-domain tail (time-ordered ingest shape): 3/5..4/5 of keys
    val cut2 = maxKey * 4 / 5
    phase("append") {
      L.appendZOrdered(
        li.filter(col("l_orderkey") > cut && col("l_orderkey") <= cut2),
        lay)
    }
    val frag = phase("frag_probe") { L.zOrderFragmentation(spark, lay) }
    println(f"""{"tool":"zorder-scale","info":"fragmentation","frac":$frag%.4f}""")
    val st1 = phase("recluster_incremental") {
      L.autoReclusterZOrderedIncremental(spark, lay, threshold = 0.05)
    }
    st1.foreach(s => println(
      s"""{"tool":"zorder-scale","info":"incremental","tail_files":${s.tailFiles},"overlapped":${s.overlappedFiles},"untouched":${s.untouchedFiles},"rewritten_bytes":${s.rewrittenBytes},"total_bytes":${s.totalBytes},"used_global":${s.usedGlobal}}"""))

    // in-domain tail: a ~2% band inside the clustered key range — the
    // overlap probe must select only the interleaved clustered files
    val bandLo = maxKey / 10
    val bandHi = bandLo + maxKey / 50
    phase("append_indomain") {
      L.appendZOrdered(
        li.filter(col("l_orderkey").between(bandLo, bandHi)), lay)
    }
    val st2 = phase("recluster_incremental_overlap") {
      L.reclusterZOrderedIncremental(spark, lay)
    }
    println(
      s"""{"tool":"zorder-scale","info":"incremental_overlap","tail_files":${st2.tailFiles},"overlapped":${st2.overlappedFiles},"untouched":${st2.untouchedFiles},"rewritten_bytes":${st2.rewrittenBytes},"total_bytes":${st2.totalBytes},"used_global":${st2.usedGlobal}}""")

    phase("recluster_global") { L.reclusterZOrdered(spark, lay) }

    // serve-while-maintain: a concurrent reader loop on the snapshot
    // contract (withMaintainedRead) hammers the layout while an append,
    // the bounded recluster and the global rewrite run — the no-quiesce
    // claim priced live: every read must land on a legal snapshot
    // (between the pre-append and post-append row counts; above = a
    // double-read across a commit window, below = a hole) and the
    // mutations must not slow for the readers.
    locally {
      val n0 = spark.read.parquet(lay).count()
      val band2Lo = maxKey / 3
      val band2Hi = band2Lo + maxKey / 50
      val tailDf = li.filter(col("l_orderkey").between(band2Lo, band2Hi))
      val tailN = tailDf.count()
      @volatile var stop = false
      @volatile var failure: Option[Throwable] = None
      val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val reader = new Thread(() => {
        try {
          while (!stop) counts.add(
            L.withMaintainedRead(spark, lay, attempts = 8)(_.count()))
        } catch { case t: Throwable => failure = Some(t) }
      })
      reader.setName("zorder-live-reader")
      reader.start()
      try {
        phase("serve_append") { L.appendZOrdered(tailDf, lay) }
        phase("serve_recluster_incremental") {
          L.reclusterZOrderedIncremental(spark, lay)
        }
        phase("serve_recluster_global") { L.reclusterZOrdered(spark, lay) }
      } finally {
        stop = true
        reader.join(300000)
      }
      val seen = counts.toArray(Array.empty[java.lang.Long])
        .map(_.longValue).toSeq
      val illegal = seen.filterNot(c => c >= n0 && c <= n0 + tailN)
      println(s"""{"tool":"zorder-scale","info":"serve_while_maintain",""" +
        s""""reads":${seen.length},"illegal":${illegal.length},""" +
        s""""reader_failed":${failure.isDefined}}""")
      failure.foreach(t => System.err.println(s"[zorder-scale] reader: $t"))
      // a broken no-quiesce contract must FAIL the audit run, not ride
      // out as fields in an info line something has to remember to read
      // — same assertion discipline as ZOrderMaintenanceSpec's live
      // reader (throwing exits the JVM nonzero)
      require(illegal.isEmpty, s"serve_while_maintain: ${illegal.length} " +
        s"ILLEGAL snapshot reads (outside [$n0, ${n0 + tailN}]): " +
        illegal.take(5).mkString(", "))
      failure.foreach(t => throw new IllegalStateException(
        "serve_while_maintain: live reader failed", t))
    }

    phase("post_read") {
      spark.read.parquet(lay)
        .filter(col("l_orderkey").between(bandLo, bandHi) &&
          col("l_partkey").between(20, 120))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
