package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale audit for the persisted IVF serving layout (s8/s9):
  * at a given SF, builds the layout with the corpus-sized quantizer
  * ([[graft.operators.Similarity.writeIvfLayoutAuto]] — cells = 4·√n)
  * and measures the two costs that matter in production:
  *
  *  - `build` — the one-off layout write (count + deterministic
  *    k-means + assignment pass + partitionBy(cell) write). The
  *    assignment term is n·cells = n^1.5 under the law; paid once per
  *    corpus generation.
  *  - `probe` — 100 queries, top-10, nprobe=8, against the written
  *    layout. Under the law a probe reads nprobe·(n/cells) =
  *    O(√n) vectors, so the decade expectation is ~√100 = 10× at
  *    100× data — NOT 100×. This is the claim the partition-pruned
  *    scan + sizing law make together; this tool measures it instead
  *    of asserting it.
  *
  * R14 lifecycle phases (BENCH_SF10 `ann_layout_audit` lifecycle half):
  *
  *  - `append` — one 10k-vector batch appended under the frozen
  *    quantizer. Batch-sized by construction; the decade ratio should
  *    be ~flat.
  *  - `delete` / `probe_pending` — 200 served vectors taken down
  *    (O(tombstones) append), then a warm probe on the pending path
  *    (broadcast anti-join above the pruned scan).
  *  - `compact_purge` / `probe_purged` — the physical purge: ONLY the
  *    hit `cell=K/` directories are rewritten (the tool prints how many
  *    of the cells that was), the appended fragmentation folds in the
  *    same pass, and the purged probe returns to the clean plan shape.
  *
  * Prints one JSON line per phase for the BENCH_SF10 `ann_layout_audit`
  * entry. Usage: AnnLayoutScale [sfDir] [layoutDir]
  */
object AnnLayoutScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = args.lift(1).getOrElse("/tmp/graft_annscale_layout")
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
      println(f"""{"tool":"ann-layout-scale","phase":"$label","sf_dir":"$dir","sec":$sec%.2f}""")
      r
    }

    val emb = graft.sources.Tables.table(spark, dir, "embeddings")
    val cents = phase("build") {
      graft.operators.Similarity.writeIvfLayoutAuto(
        emb, base, "vec_id", "embedding")
    }
    val n = spark.read.parquet(s"$base/cells").count()
    println(s"""{"tool":"ann-layout-scale","info":"geometry","rows":$n,"cells":${cents.length},"mean_occupancy":${n / cents.length}}""")

    // queries = the base replica's first 100 ids (present at every SF)
    val queries = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // warm the layout listing once so probe_warm times the probe, not
    // the first file-index build; probe_cold keeps the first-touch cost
    val got = phase("probe_cold") {
      graft.operators.Similarity.ivfTopKIndexed(spark, base, queries,
        "qid", "qvec", k = 10, nprobe = 8).count()
    }
    val got2 = phase("probe_warm") {
      graft.operators.Similarity.ivfTopKIndexed(spark, base, queries,
        "qid", "qvec", k = 10, nprobe = 8).count()
    }
    println(s"""{"tool":"ann-layout-scale","info":"probe_rows","cold":$got,"warm":$got2}""")

    // ---- lifecycle: append -> takedown -> pending probe -> purge ----
    val Sim = graft.operators.Similarity
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    // one ingest batch: up to 10k fresh vectors (ids shifted past the
    // corpus; the whole corpus when it is smaller than that)
    val batch = emb.filter(col("vec_id") < 10000)
      .withColumn("vec_id", col("vec_id") + lit(maxId + 1L))
    val nBatch = batch.count()
    phase("append") { Sim.appendIvfLayout(batch, base) }
    // takedown: 200 served ids, evenly spread over the id space (the
    // takedown-realistic shape is an id list, not a corpus fraction)
    val stride = math.max(1L, (maxId + 1L) / 200L)
    val victims = (0L until 200L).map(_ * stride)
    phase("delete") { Sim.deleteFromIvfLayout(spark, base, victims) }
    val gotPending = phase("probe_pending") {
      Sim.ivfTopKIndexed(spark, base, queries,
        "qid", "qvec", k = 10, nprobe = 8).count()
    }
    val hitCells = spark.read.parquet(s"$base/cells")
      .filter(col("vec_id").isin(victims: _*))
      .select("cell").distinct().count()
    val purgedRows = phase("compact_purge") {
      Sim.compactIvfLayout(spark, base)
    }
    val gotPurged = phase("probe_purged") {
      Sim.ivfTopKIndexed(spark, base, queries,
        "qid", "qvec", k = 10, nprobe = 8).count()
    }
    println(s"""{"tool":"ann-layout-scale","info":"lifecycle","appended":$nBatch,"tombstoned":${victims.length},"purged_rows":$purgedRows,"hit_cells":$hitCells,"cells":${cents.length},"probe_pending_rows":$gotPending,"probe_purged_rows":$gotPurged}""")

    // ---- serve-while-maintain (r19): the no-quiesce probe contract
    // priced LIVE across a second lifecycle round, the serving twin of
    // zorder_audit's serve_while_maintain and the measured pairing of
    // the membership-registry read path: a probe racing a mutation must
    // retry-heal, never fail, and never serve an illegal result.
    // Contracts per mutation, matched to what each guarantees:
    //  - append: prefix visibility is legal (the serving corpus grows
    //    monotonically within the append window), so the live contract
    //    is no-failure + well-formed top-k shape every read;
    //  - takedown: visibility flips atomically per read (the tombstone
    //    list is read once per probe), so every observation must equal
    //    the pre- OR post-delete served set, nothing in between;
    //  - compaction: content-invariant (purges only rows the pending-
    //    tombstone anti-join already hides, folds the rest), so every
    //    observation must equal the served set EXACTLY — this is the
    //    per-cell rename-swap window the registry turns from a silent
    //    short view into a retryable, and withServedProbe heals.
    locally {
      def probeSet() = Sim.withServedProbe(attempts = 8) {
        Sim.ivfTopKIndexed(spark, base, queries, "qid", "qvec",
          k = 10, nprobe = 8).collect().map(_.toSeq).toSet
      }
      val expectRows = queries.count() * 10
      @volatile var stop = false
      @volatile var failure: Option[Throwable] = None

      // phase 1: live during APPEND (shape contract)
      val reads1 = new java.util.concurrent.atomic.AtomicLong
      val badShape = new java.util.concurrent.atomic.AtomicLong
      val batch2 = emb.filter(col("vec_id") < 10000)
        .withColumn("vec_id", col("vec_id") + lit(2L * (maxId + 1L)))
      val t1 = new Thread(() => {
        try while (!stop) {
          val r = probeSet()
          reads1.incrementAndGet()
          if (r.size != expectRows) badShape.incrementAndGet()
        } catch { case t: Throwable => failure = Some(t) }
      })
      t1.setName("ann-live-prober-append"); t1.start()
      phase("serve_append") { Sim.appendIvfLayout(batch2, base) }
      stop = true; t1.join(300000)

      // phase 2: live during TAKEDOWN (pre-or-post contract, validated
      // retrospectively once the post set is known)
      val pre = probeSet()
      val victims2 = (0L until 200L).map(_ * stride + stride / 2)
        .filter(_ <= maxId)
      val obs = new java.util.concurrent.ConcurrentLinkedQueue[
        Set[Seq[Any]]]()
      stop = false
      val t2 = new Thread(() => {
        try while (!stop) obs.add(probeSet())
        catch { case t: Throwable => failure = Some(t) }
      })
      t2.setName("ann-live-prober-delete"); t2.start()
      phase("serve_delete") { Sim.deleteFromIvfLayout(spark, base, victims2) }
      stop = true; t2.join(300000)
      val post = probeSet()
      val obsSeq = {
        val b = Seq.newBuilder[Set[Seq[Any]]]
        val it = obs.iterator(); while (it.hasNext) b += it.next()
        b.result()
      }
      val illegalDelete = obsSeq.count(o => o != pre && o != post)

      // phase 3: live during COMPACTION (exact-equality contract)
      val reads3 = new java.util.concurrent.atomic.AtomicLong
      val illegal3 = new java.util.concurrent.atomic.AtomicLong
      stop = false
      val t3 = new Thread(() => {
        try while (!stop) {
          val r = probeSet()
          reads3.incrementAndGet()
          if (r != post) illegal3.incrementAndGet()
        } catch { case t: Throwable => failure = Some(t) }
      })
      t3.setName("ann-live-prober-compact"); t3.start()
      val purged2 = phase("serve_compact_purge") {
        Sim.compactIvfLayout(spark, base)
      }
      stop = true; t3.join(300000)
      val postCompact = probeSet()

      println(s"""{"tool":"ann-layout-scale","info":"serve_while_maintain",""" +
        s""""append_reads":${reads1.get},"append_bad_shape":${badShape.get},""" +
        s""""delete_reads":${obsSeq.length},"delete_illegal":$illegalDelete,""" +
        s""""compact_reads":${reads3.get},"compact_illegal":${illegal3.get},""" +
        s""""purged_rows":$purged2,"prober_failed":${failure.isDefined}}""")
      // a broken no-quiesce contract must FAIL the audit run (nonzero
      // exit), not ride out as info-line fields — ZOrderScale discipline
      failure.foreach(t => throw new IllegalStateException(
        "serve_while_maintain: live prober failed", t))
      require(badShape.get == 0, s"serve_while_maintain: ${badShape.get} " +
        "malformed top-k results during the append window")
      require(illegalDelete == 0, s"serve_while_maintain: $illegalDelete " +
        "observations neither pre- nor post-delete during the takedown")
      require(illegal3.get == 0, s"serve_while_maintain: ${illegal3.get} " +
        "observations diverged from the served set during compaction")
      require(postCompact == post,
        "serve_while_maintain: compaction changed the served set")
    }

    // corpus k-NN graph under the corpus-sized quantizer (knnGraphAuto):
    // the n^1.5 claim measured — a frozen quantizer would be n^2/c
    val edges = phase("knn_graph_auto") {
      graft.operators.Similarity.knnGraphAuto(
        emb, "vec_id", "embedding", k = 5, nprobe = 2).count()
    }
    println(s"""{"tool":"ann-layout-scale","info":"knn_graph","edges":$edges}""")

    // the graph FROM the layout (knnGraphIndexed): the base side's cell
    // assignment is already materialized as partition directories and
    // the quantizer is the layout's own stored centroids — measures the
    // no-training, no-base-assignment saving vs knn_graph_auto (the
    // layout at this point is the post-lifecycle generation:
    // corpus + appended batch − purged takedowns)
    val edgesIx = phase("knn_graph_indexed") {
      graft.operators.Similarity.knnGraphIndexed(spark, base,
        k = 5, nprobe = 2).count()
    }
    println(s"""{"tool":"ann-layout-scale","info":"knn_graph_indexed","edges":$edgesIx}""")
    spark.stop()
  }
}
