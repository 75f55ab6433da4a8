package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`) — north-star tier (SURVEY.md §2.3).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline. The (small) query set is
  *    broadcast, so the corpus is scanned once with no corpus shuffle; the
  *    per-query ranking shuffles only (qid, corpus_id, sim) triples.
  *  - [[lshTopK]]: scale path. Sign-random-projection bucketing — each
  *    vector reduces to a small integer bucket; queries probe only their
  *    bucket, turning the cross product into a hash join on bucket id.
  *
  * The cosine kernel is the codegen'd native expression
  * ([[graft.functions.CosineSimilarity]]), not a UDF or higher-order
  * function — this is the hot loop at 100 TB.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) — the big side, scanned once
    * @param queries (qidCol, qvecCol) — small, broadcast to every task
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String,
                     qidCol: String, qvecCol: String,
                     k: Int, excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val joined = corpus.crossJoin(broadcast(queries))
    val withSim = joined
      .withColumn("sim", round(GraftFunctions.cosineSim(col(vecCol), col(qvecCol)), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(idCol) =!= col(qidCol)) else withSim
    rankTopK(filtered, idCol, qidCol, k)
  }

  /** Per-query ranking via the bounded TopKByScore aggregate (NOT a window
    * function): each map task reduces its partition to ≤ k pairs per query
    * before the shuffle, so the exchange carries O(k × partitions) rows per
    * query instead of the whole candidate set. Output matches the window
    * formulation bit-for-bit: rank by (sim DESC, id ASC), rank ≤ k.
    */
  private def rankTopK(withSim: DataFrame, idCol: String, qidCol: String,
                       k: Int): DataFrame =
    withSim
      .groupBy(col(qidCol))
      .agg(GraftFunctions.topK(col("sim"), col(idCol), k).as("tk"))
      .select(col(qidCol), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col(qidCol), col("p.id").as(idCol), col("p.score").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col(qidCol), col("rank"))

  /** Default hyperplanes per table (bucket space 2^planes per table). */
  val DefaultPlanes = 8

  /** Default number of independent hash tables (band-OR over tables). */
  val DefaultTables = 16

  /** Approximate top-k via multi-table SRP LSH with Hamming-1 multi-probe.
    *
    * Recall mechanics: a true neighbor at angle θ agrees with one plane
    * with p = 1 - θ/π, lands in the same bucket of ONE table with p^planes,
    * and within Hamming distance 1 with p^planes + planes·p^(planes-1)(1-p);
    * independent tables OR together: recall = 1-(1-p_table)^tables. At the
    * defaults (8 planes, 16 tables, multi-probe on) neighbors at cos ≥ 0.25
    * (p ≥ 0.58) exceed ~0.75 expected recall — asserted ≥ 0.6 against the
    * exact baseline in `LshRecallSpec`. Single-table single-probe was
    * measured at ~2% recall on the same fixture: an ANN operator needs the
    * table/probe dials, not just the bucket hash.
    *
    * Scale shape (100 TB): the corpus is bucketed once per table (narrow
    * scan, `tables`× replication — the classic LSH index memory trade);
    * each query probes (1 + planes) buckets per table, i.e. touches
    * ~tables·(1+planes)/2^planes of the corpus instead of all of it.
    * Candidates dedup on (query, id) BEFORE ranking so multi-table hits
    * are not double-counted; ranking is the bounded TopKByScore aggregate
    * with map-side partials.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String,
              qidCol: String, qvecCol: String,
              k: Int, dim: Int, planes: Int = DefaultPlanes,
              tables: Int = DefaultTables, multiProbe: Boolean = true,
              excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)

    // All per-table bucket ids come from ONE SrpBuckets kernel call
    // (tables × planes dot products in a single pass over the vector).
    val cb = corpus
      .select(col(idCol), col(vecCol),
        posexplode(GraftFunctions.srpBuckets(col(vecCol), tables, planes, dim))
          .as(Seq("tbl", "bkt")))

    // Query probes: own bucket per table, plus every Hamming-1 neighbor
    // bucket (flip each plane bit) when multiProbe is on. letBound keeps
    // each base bucket evaluated once, not once per probe.
    val qProbes = graft.functions.TextFunctions.letBound(
      GraftFunctions.srpBuckets(col(qvecCol), tables, planes, dim)) { bks =>
      flatten(array((0 until tables).map { t =>
        graft.functions.TextFunctions.letBound(element_at(bks, t + 1)) { base =>
          val probes = base +: (if (multiProbe)
            (0 until planes).map(j => base.bitwiseXOR(lit(1L << j)))
          else Seq.empty)
          array(probes.map(p => struct(lit(t).as("tbl"), p.as("bkt"))): _*)
        }
      }: _*))
    }
    val qb = queries
      .select(col(qidCol), col(qvecCol), explode(qProbes).as("pb"))
      .select(col(qidCol), col(qvecCol),
        col("pb.tbl").as("tbl"), col("pb.bkt").as("bkt"))

    val joined = cb.join(broadcast(qb), Seq("tbl", "bkt"))
    val withSim = joined
      .withColumn("sim", round(GraftFunctions.cosineSim(col(vecCol), col(qvecCol)), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(idCol) =!= col(qidCol)) else withSim
    val deduped = filtered.select(col(qidCol), col(idCol), col("sim")).distinct()
    rankTopK(deduped, idCol, qidCol, k)
  }

  /** Deterministic spherical k-means coarse quantizer for [[ivfTopK]].
    *
    * Trains on a bounded, id-ordered sample COLLECTED TO THE DRIVER —
    * that is the standard IVF shape (the quantizer is tiny and trained
    * offline on a sample; only the assignment pass is distributed).
    * Init = `c` evenly spaced vectors of the sorted sample; Lloyd rounds
    * assign by inner product and re-normalize the mean; empty cells keep
    * their centroid. Fully deterministic — no RNG, stable across runs
    * and engines.
    *
    * Scale shape of the sample ([[trainSample]]): one count, one
    * hash-threshold filter (no shuffle, no sort anywhere on the
    * executors), one bounded collect — corpus-size-independent driver
    * work. The lowest-id window over the (possibly hash-pre-filtered)
    * survivor set is a deliberate choice: deterministic and
    * reproducible across engines with no RNG, and the frozen AnnModels
    * artifact (and its parity spec) pins it.
    *
    * SAMPLING REGIME (also applies to [[trainPqCodebooks]]): a corpus at
    * or below 4·maxTrain rows trains on exactly the lowest `maxTrain`
    * ids; a LARGER corpus switches to a deterministic hash pre-filter
    * (`pmod(hash(id), 2³⁰) < t`, t sized from one count) and trains on
    * the lowest `maxTrain` ids of the SURVIVORS — still fully
    * deterministic for a given corpus, but a different sample than the
    * unfiltered window, so growing a corpus across the 4·maxTrain
    * boundary changes the trained model. To pin the exact lowest-id
    * window at any size, pre-sample the input yourself (e.g.
    * `emb.filter(col(id) < cutoff)`) or raise `maxTrain`.
    * `TrainSampleRegimeSpec` pins both regimes.
    *
    * @return c L2-normalized centroids (row-major)
    */
  /** Bounded deterministic training sample shared by [[trainCentroids]]
    * and [[trainPqCodebooks]] — WITHOUT a corpus-wide sort. A corpus at
    * or below 4·maxTrain rows is collected whole; a larger one is
    * pre-filtered with a deterministic hash threshold
    * (`pmod(hash(id), 2³⁰) < t`, `t` sized from one count so the
    * expected survivor set is 2–4·maxTrain rows — Murmur3 with a fixed
    * seed, so the same corpus always selects the same rows). Either way
    * the bounded survivor set is sorted BY ID ON THE DRIVER (null-first,
    * matching Spark's default) and truncated to maxTrain: the executors
    * never range-exchange anything, and the id-window determinism the
    * frozen AnnModels artifact pins is preserved verbatim for every
    * corpus that fits the unfiltered branch (all committed fixtures do).
    * The previous `orderBy(id).limit(maxTrain)` fell over Spark's top-K
    * fallback threshold at exactly maxTrain = 10000 and planned a
    * corpus-wide Exchange rangepartitioning — a global sort to take a
    * 10k-row sample.
    */
  private def trainSample(emb: DataFrame, idCol: String, vecCol: String,
                          maxTrain: Int): Array[Array[Float]] = {
    val base = emb.select(col(idCol).as("__oid"),
      col(vecCol).cast("array<float>").as("v"))
    val n = base.count()
    val picked =
      if (n > 4L * maxTrain) {
        val buckets = 1 << 30
        val t = math.max(1L, 4L * maxTrain * buckets / n)
        base.filter(pmod(hash(col("__oid")), lit(buckets)) < lit(t))
      } else base
    // Spark-faithful ordering: nulls first (Spark's ASC default) and
    // BINARY order for strings — String.compareTo is UTF-16 code-unit
    // order, which diverges from Spark's UTF8String ordering for
    // supplementary-plane characters, so string keys are converted to
    // UTF8String ONCE per row (not per comparison) before the sort.
    // Non-Comparable id types (array/struct keys) fail loudly with a
    // remedy instead of a bare ClassCastException.
    val keyed = picked.collect().map { r =>
      val k = r.get(0) match {
        case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
        case x => x
      }
      (k, r)
    }
    def lt(a: Any, b: Any): Boolean =
      if (a == null) b != null
      else if (b == null) false
      else a match {
        case x: Comparable[_] => x.asInstanceOf[Comparable[Any]].compareTo(b) < 0
        case _ => throw new IllegalArgumentException(
          s"trainSample: id type ${a.getClass.getName} has no driver-side " +
            "ordering — use a scalar id column, or train on a pre-sampled " +
            "table")
      }
    keyed.sortWith((x, y) => lt(x._1, y._1))
      .take(maxTrain)
      .map(_._2.getSeq[Float](1).toArray)
  }

  def trainCentroids(emb: DataFrame, idCol: String, vecCol: String,
                     c: Int = 32, iters: Int = 5,
                     maxTrain: Int = 10000): Seq[Seq[Float]] = {
    val sample = trainSample(emb, idCol, vecCol, maxTrain)
    require(sample.length >= c, s"need >= $c training vectors, got ${sample.length}")
    val dim = sample.head.length

    def normalize(x: Array[Double]): Array[Double] = {
      val n = math.sqrt(x.map(d => d * d).sum)
      if (n == 0.0) x else x.map(_ / n)
    }
    val unit = sample.map(v => normalize(v.map(_.toDouble)))
    val stride = sample.length / c
    var centroids = Array.tabulate(c)(i => unit(i * stride).clone())

    (0 until iters).foreach { _ =>
      val sums = Array.fill(c)(new Array[Double](dim))
      val counts = new Array[Int](c)
      unit.foreach { x =>
        var bestC = 0; var bestD = Double.NegativeInfinity
        var ci = 0
        while (ci < c) {
          var d = 0.0; var i = 0
          while (i < dim) { d += x(i) * centroids(ci)(i); i += 1 }
          if (d > bestD) { bestD = d; bestC = ci }
          ci += 1
        }
        var i = 0
        while (i < dim) { sums(bestC)(i) += x(i); i += 1 }
        counts(bestC) += 1
      }
      centroids = Array.tabulate(c)(ci =>
        if (counts(ci) == 0) centroids(ci) else normalize(sums(ci)))
    }
    centroids.map(_.map(_.toFloat).toSeq).toSeq
  }

  /** Approximate top-k via an IVF (inverted-file) index: the corpus is
    * partitioned into the trained centroid cells (one narrow kernel
    * projection, nprobe=1), queries probe their `nprobe` nearest cells,
    * and candidates meet in a hash join on the cell id. Cells are
    * disjoint, so no candidate dedup is needed (unlike multi-table LSH).
    *
    * Scale shape (100 TB): NO corpus replication (the LSH index costs
    * `tables`×) — each corpus vector appears exactly once; a query scans
    * ~nprobe/c of the corpus. The quantizer is a literal in the plan, so
    * executors need no side input. Recall depends on how clustered the
    * data is; gate with `LshRecallSpec`'s IVF test (measured vs exact).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String,
              qidCol: String, qvecCol: String,
              k: Int, centroids: Seq[Seq[Float]], nprobe: Int = 8,
              excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cb = corpus.withColumn("cell",
      element_at(GraftFunctions.ivfProbes(col(vecCol), centroids, 1), 1))
    val qb = queries.withColumn("cell",
      explode(GraftFunctions.ivfProbes(col(qvecCol), centroids, nprobe)))
    val joined = cb.join(broadcast(qb), Seq("cell"))
    val withSim = joined
      .withColumn("sim", round(GraftFunctions.cosineSim(col(vecCol), col(qvecCol)), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(idCol) =!= col(qidCol)) else withSim
    rankTopK(filtered, idCol, qidCol, k)
  }

  /** Approximate k-NN GRAPH over the whole corpus: every vector's top-k
    * neighbors — the building block for SemDeDup-style curation, graph
    * clustering over embeddings, and diversity sampling. The s-family
    * probe operators assume a broadcast-SMALL query side; here the
    * query side IS the corpus, so the candidate join is a cell-keyed
    * SHUFFLE equi-join instead of a broadcast: corpus rows sit in their
    * one argmax cell, the probe side fans each vector to its `nprobe`
    * nearest cells (one [[graft.functions.IvfProbe]] kernel call each
    * way), and candidates meet on the cell id. A (query, neighbor) pair
    * can meet in at most ONE cell — the base side is argmax-assigned —
    * so no dedup precedes the ranking, which is the bounded TopKByScore
    * aggregate (≤ k pairs per query leave each map task).
    *
    * Scale shape (100 TB): pair work is Σ_cell |cell|·|probes(cell)| ≈
    * n²·nprobe/cells; under the [[ivfCellsFor]] 4√n law that is
    * n^1.5·nprobe/4 — sub-quadratic by construction (the all-pairs graph
    * is n²), the classic IVF graph-build cost. `maxCell` caps a hot
    * cell's corpus side in stable id order (the SemDeDup discipline) so
    * one dense region cannot go quadratic; recall measured 0.72 at
    * sf0.01 vs the exact graph, gated ≥ 0.5 in `KnnGraphSpec`.
    *
    * @return (qid, idCol, sim, rank ≤ k) — one row per graph edge
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int, centroids: Seq[Seq[Float]], nprobe: Int = 2,
               maxCell: Int = 10000): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val base = Dedup.capBucketRows(
      corpus.select(col(idCol), col(vecCol))
        .withColumn("cell",
          element_at(GraftFunctions.ivfProbes(col(vecCol), centroids, 1), 1)),
      Seq("cell"), idCol, maxCell)
    val probes = corpus
      .select(col(idCol).as("qid"), col(vecCol).as("__qvec"))
      .withColumn("cell",
        explode(GraftFunctions.ivfProbes(col("__qvec"), centroids, nprobe)))
    val withSim = base.join(probes, Seq("cell"))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col(vecCol), col("__qvec")), 6))
    rankTopK(withSim, idCol, "qid", k)
  }

  /** [[knnGraph]] with the quantizer sized from the CORPUS by
    * [[ivfCellsFor]] and trained by the deterministic [[trainCentroids]]
    * — the data-sized production entry (the same composition as
    * [[Dedup.semDeDupAuto]] and [[writeIvfLayoutAuto]]). A FROZEN
    * quantizer makes the graph build quadratic again: pair work is
    * n²·nprobe/cells, so cells must grow with the corpus for the
    * n^1.5 shape to hold — the d5b/d5d lesson applied to graphs,
    * decade-audited in BENCH_SF10 `ann_layout_audit` (tools.
    * AnnLayoutScale `knn_graph` phase). The frozen-quantizer s11 entry
    * stays for the oracle (static centroid literals); this is what
    * production calls.
    */
  def knnGraphAuto(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, nprobe: Int = 2, mult: Int = 4,
                   iters: Int = 5, maxTrain: Int = 10000,
                   maxCell: Int = 10000): DataFrame = {
    val n = corpus.count()
    if (n == 0)
      return knnGraph(corpus, idCol, vecCol, k,
        Seq(Seq.fill(2)(0f)), nprobe, maxCell).limit(0)
    val cells = math.min(n,
      math.min(ivfCellsFor(n, mult), math.max(1, maxTrain / 4)).toLong).toInt
    val cents = trainCentroids(corpus, idCol, vecCol, cells, iters, maxTrain)
    knnGraph(corpus, idCol, vecCol, k, cents, nprobe, maxCell)
  }

  /** [[knnGraph]] built FROM a persisted [[writeIvfLayout]] layout —
    * one serving artifact, two uses. The base side's cell assignment is
    * already materialized as the layout's partition directories (no
    * assignment kernel pass, no re-quantizing drift: the graph runs
    * under the layout's OWN stored centroids), the probe side fans the
    * same stored vectors to their nprobe cells, and pending takedown
    * tombstones are anti-joined on BOTH sides — a taken-down vector
    * neither appears as a neighbor nor asks as a query, so the graph
    * over a post-takedown layout is the graph of the retained corpus.
    * Bit-identical to [[knnGraph]] over the retained rows under the
    * same centroids (spec-proven). `maxCell` caps the neighbor side
    * exactly like the live path.
    */
  /** The full cells table under the registry read contract (explicit
    * registered dirs — see [[writeIvfLayout]]'s registry note);
    * listing-discovery fallback for pre-registry layouts. */
  private def readCellsTable(spark: org.apache.spark.sql.SparkSession,
                             path: String): DataFrame =
    Dedup.readMemberDirs(
        new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration),
        path, "cells").filter(_.nonEmpty) match {
      case Some(dirs) => Dedup.readRegisteredDirs(spark, s"$path/cells",
        dirs.toSeq.sorted, None)
      case None => spark.read.parquet(s"$path/cells")
    }

  def knnGraphIndexed(spark: org.apache.spark.sql.SparkSession,
                      path: String, k: Int, nprobe: Int = 2,
                      maxCell: Int = 10000): DataFrame = {
    GraftFunctions.register(spark)
    val p = readIvfLayoutParams(spark, path)
    val rows0 = readCellsTable(spark, path)
    val rows = Dedup.readTombstones(spark, path).fold(rows0) { t =>
      rows0.join(broadcast(t.select(col("id").as("__tomb_id"))),
        col(p.idCol).try_cast("long") === col("__tomb_id"), "left_anti")
    }
    val base = Dedup.capBucketRows(
      rows.select(col(p.idCol), col(p.vecCol), col("cell")),
      Seq("cell"), p.idCol, maxCell)
    val probes = rows
      .select(col(p.idCol).as("qid"), col(p.vecCol).as("__qvec"))
      .withColumn("cell", explode(
        GraftFunctions.ivfProbes(col("__qvec"), p.centroids, nprobe)))
    val withSim = base.join(probes, Seq("cell"))
      .filter(col(p.idCol) =!= col("qid"))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col(p.vecCol), col("__qvec")), 6))
    rankTopK(withSim, p.idCol, "qid", k)
  }

  /** Incremental k-NN graph maintenance: fold a batch of NEW vectors
    * into an existing [[knnGraph]] WITHOUT rebuilding it — provably ≡
    * the full rebuild, at batch-proportional cost.
    *
    * Why it decomposes exactly: the rebuild's candidate set per query
    * splits by which side the candidate came from —
    * `cands(q, corpus ∪ batch) = cands(q, corpus) ∪ cands(q, batch)` —
    * and top-k is monotone (`topk(A ∪ B) = topk(topk(A) ∪ B)`), so the
    * old graph's k edges stand in for the whole corpus-side candidate
    * set. Three pair streams, NONE of them corpus×corpus:
    * (a) batch queries × the whole base (corpus read ONCE, no
    * self-join), (b) old corpus queries × the batch base only (their
    * corpus-side edges already live in `oldGraph`), (c) `oldGraph`
    * itself. Union → one bounded top-k re-rank.
    *
    * The `maxCell` cap survives the decomposition because of the
    * MONOTONE ID CONTRACT (enforced: every batch id must exceed every
    * corpus id, the same contract as the index appends): the rebuild's
    * cap keeps a cell's `maxCell` LOWEST ids, which is the corpus's own
    * capped rows followed by the batch's first `maxCell − occ` — so
    * the increment re-derives it from one per-cell corpus count, never
    * a corpus re-window.
    *
    * Scale shape (100 TB): a rebuild pays n²·nprobe/cells; the
    * increment pays two corpus SCANS (cell assignment + the old graph
    * union) plus pair work proportional to the batch's cell
    * occupancies — the graph twin of the persisted indexes' "per-batch
    * work tracks the batch" claim. Centroids must be the graph's own
    * (same quantizer as the original build — pass the same frozen
    * artifact or the `knnGraphAuto` training output).
    *
    * @param oldGraph prior [[knnGraph]] output over `corpus` (same k,
    *                 centroids, nprobe, maxCell)
    * @return the graph over `corpus ∪ batch`, bit-identical to
    *         `knnGraph(corpus ∪ batch, …)` (spec-proven, cap included)
    */
  def knnGraphIncrement(oldGraph: DataFrame, corpus: DataFrame,
                        batch: DataFrame, idCol: String, vecCol: String,
                        k: Int, centroids: Seq[Seq[Float]],
                        nprobe: Int = 2,
                        maxCell: Int = 10000): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    // monotone id contract: max corpus id < min batch id — the cap
    // decomposition below is wrong without it, so fail loudly like the
    // index appends do. Compared under the id column's OWN ordering
    // (one narrow aggregate job), so non-long id types keep working.
    val chk = corpus.agg(max(col(idCol)).as("__m"))
      .crossJoin(batch.agg(min(col(idCol)).as("__n"),
        count(lit(1)).as("__c"), count(col(idCol)).as("__cn")))
      .select(
        // coalesce(false): an all-NULL batch id column makes the raw
        // predicate SQL NULL — fail with the contract message below,
        // not a bare NPE from getBoolean
        coalesce(col("__c") === 0 || col("__m").isNull ||
          col("__m") < col("__n"), lit(false)).as("ok"),
        // min() ignores NULLs, so a partially-NULL id column could
        // pass the monotone check yet decompose the cap differently
        // than a rebuild — reject NULL ids loudly like the index
        // appends do
        (col("__cn") === col("__c")).as("no_nulls"),
        col("__m"), col("__n"))
      .head()
    require(chk.getBoolean(1),
      s"knnGraphIncrement: batch has NULL ids — the id contract " +
        "(unique, non-null, monotone) is violated; re-id the batch")
    require(chk.getBoolean(0),
      s"knnGraphIncrement: batch ids must exceed every corpus id " +
        s"(monotone contract; corpus max ${chk.get(2)}, batch min " +
        s"${chk.get(3)}) — re-id the batch or rebuild with knnGraph")
    def celled(df: DataFrame) = df.select(col(idCol), col(vecCol))
      .withColumn("cell",
        element_at(GraftFunctions.ivfProbes(col(vecCol), centroids, 1), 1))
    def probes(df: DataFrame) = df
      .select(col(idCol).as("qid"), col(vecCol).as("__qvec"))
      .withColumn("cell",
        explode(GraftFunctions.ivfProbes(col("__qvec"), centroids, nprobe)))
    val corpusBase = Dedup.capBucketRows(celled(corpus), Seq("cell"),
      idCol, maxCell)
    // batch rows take the cap slots the corpus left open, in id order —
    // exactly the union-cap's choice under the monotone contract
    val occ = celled(corpus).groupBy("cell").agg(count(lit(1)).as("__occ"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col(idCol))
    val batchBase = celled(batch)
      .join(occ, Seq("cell"), "left")
      .withColumn("__occ", coalesce(col("__occ"), lit(0L)))
      .withColumn("__bn", row_number().over(w))
      .filter(col("__bn") <= lit(maxCell) -
        least(col("__occ"), lit(maxCell.toLong)))
      // restore corpusBase's column order (the occ join front-loaded
      // the key; union is positional)
      .select(col(idCol), col(vecCol), col("cell"))
    def sim(base: DataFrame, qs: DataFrame) = base.join(qs, Seq("cell"))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col(vecCol), col("__qvec")), 6))
      .select(col("qid"), col(idCol), col("sim"))
    val newEdges =
      sim(corpusBase.union(batchBase), probes(batch))   // (a)
        .union(sim(batchBase, probes(corpus)))          // (b)
    val merged = oldGraph.select(col("qid"), col(idCol), col("sim"))
      .union(newEdges)
    rankTopK(merged, idCol, "qid", k)
  }

  /** Persisted IVF cell-partitioned corpus layout — the ANN *serving*
    * artifact. The corpus is written `partitionBy(cell)` under its
    * nearest frozen-centroid cell (one directory per cell, the cell id
    * never stored inside the data files), beside a one-row params table
    * carrying the centroid matrix itself. The layout is therefore
    * self-describing: [[ivfTopKIndexed]] probes under the layout's OWN
    * quantizer, so a writer/prober geometry mismatch is unrepresentable —
    * the same contract the persisted MinHash/SRP indexes enforce via
    * their params tables.
    *
    * Scale shape (100 TB): a probe reads ~nprobe/c of the corpus BYTES
    * at the storage layer — the probed-cell IN-set reaches the scan as
    * `PartitionFilters`, pruning every other `cell=K/` directory from
    * the file listing (the same mechanism as the band-shard probes,
    * PLANS.md b3b), not as a post-scan filter. The single
    * `repartition(cell)` before the write keeps the file count bounded:
    * each shuffle task holds whole cells, so a cell directory gets a
    * handful of files instead of one per (task × cell) — the
    * small-files bound at 1000 executors.
    *
    * LIFECYCLE: the layout carries the index family's mutation story —
    * [[appendIvfLayout]] grows it under the frozen quantizer (≡ rebuild,
    * cell assignment is a pure function of (vector, centroids)),
    * [[deleteFromIvfLayout]] tombstones served vectors (hidden from the
    * next probe, physically purged by [[compactIvfLayout]] — the
    * takedown path for the SERVED ANN corpus, not just the dedup
    * indexes), all under the shared epoch fence / rename-aside swap /
    * format-version discipline of [[Dedup]]'s persisted indexes. An
    * overwrite rebuild clears stale tombstones, exactly like the index
    * builds.
    */
  def writeIvfLayout(corpus: DataFrame, path: String,
                     idCol: String, vecCol: String,
                     centroids: Seq[Seq[Float]],
                     pqCodebooks: Seq[Seq[Float]] = Nil,
                     pqM: Int = 0, pqK: Int = 0): Unit = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    // previous generation's pending deletes must not hide the new
    // build's rows (same rebuild contract as the dedup indexes)
    Dedup.clearTombstones(spark, path)
    val celled = corpus
      .withColumn("cell",
        element_at(GraftFunctions.ivfProbes(col(vecCol), centroids, 1), 1))
    // optional PQ codes, encoded ONCE at write time: the ADC probe then
    // reads (id, codes) only — parquet column pruning keeps the
    // 4·dim-byte vectors unread until the exact re-rank stage (and the
    // plain ivfTopKIndexed probe symmetrically never reads the codes)
    val coded =
      if (pqCodebooks.isEmpty) celled
      else celled.withColumn("codes",
        GraftFunctions.pqEncode(col(vecCol), pqCodebooks, pqM, pqK))
    coded
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    // membership registry: probes read the REGISTERED cell dirs by
    // explicit path (no readdir of cells/), so a cell dir a racing
    // readdir would miss — or one mid-compaction-swap, genuinely absent
    // for an instant — throws retryable instead of silently narrowing
    // the served candidate set (see Dedup's registry contract)
    Dedup.syncMemberDirs(corpus.sparkSession, path, "cells", replace = true)
    // driver-side one-row params write (r20 — see writeIndexParams;
    // the quantizer matrices go through MetaIO's Spark-byte-compatible
    // array<array<float>> encoding)
    locally {
      import graft.sources.MetaIO
      MetaIO.writeTable(spark.sparkContext.hadoopConfiguration,
        s"$path/params",
        Seq("id_col" -> MetaIO.MString, "vec_col" -> MetaIO.MString,
          "centroids" -> MetaIO.MFloatMatrix,
          "pq_codebooks" -> MetaIO.MFloatMatrix,
          "pq_m" -> MetaIO.MInt, "pq_k" -> MetaIO.MInt,
          "format_version" -> MetaIO.MInt),
        Seq(Seq(idCol, vecCol, centroids.map(_.toSeq),
          pqCodebooks.map(_.toSeq), pqM, pqK, Dedup.IndexFormatVersion)))
    }
    Dedup.writeEpoch0(spark, path)
  }

  /** [[ivfTopK]] against a persisted [[writeIvfLayout]] layout: probes
    * run under the layout's own stored quantizer and read only the
    * probed cell directories (partition-pruned scan). Result is
    * bit-identical to the live [[ivfTopK]] under the same geometry —
    * the layout is an execution artifact, invisible to the result
    * contract.
    *
    * The probed-cell set is collected driver-side to become the scan's
    * literal partition predicate — bounded at O(queries × nprobe) ints
    * (the query side is the broadcast-small side by contract), never
    * corpus-sized.
    */
  /** The IVF quantizer sizing law, exposed as a pure function like
    * `Dedup.srpPlanesFor` / `Dedup.semDedupCellsFor`: cells ≈
    * `mult·√n` (the classic IVF recommendation — FAISS documents
    * 4√n–16√n), so mean cell occupancy is √n/mult and a fixed-nprobe
    * probe reads O(√n) vectors — sub-linear across every decade —
    * while the one-off build's assignment term n·cells stays n^1.5,
    * not n². A quantizer FROZEN at a smaller corpus's size loses both:
    * occupancy (and probe cost) then grows linearly with the corpus.
    * `maxCells` caps the centroid literal the codegen'd assignment
    * kernel carries in the plan (cells·dim floats); past the cap,
    * probe cost degrades gracefully back toward linear-with-n — shard
    * the corpus into multiple layouts before that point.
    */
  def ivfCellsFor(n: Long, mult: Int = 4, minCells: Int = 8,
                  maxCells: Int = 4096): Int = {
    require(mult > 0, s"mult must be > 0: $mult")
    require(minCells > 0 && maxCells >= minCells,
      s"bad cell clamp: [$minCells, $maxCells]")
    val raw = math.ceil(mult * math.sqrt(math.max(n, 1L).toDouble)).toInt
    math.min(maxCells, math.max(minCells, raw))
  }

  /** [[writeIvfLayout]] with the quantizer sized from the CORPUS by
    * [[ivfCellsFor]] and trained by the deterministic [[trainCentroids]]
    * — the data-sized production entry (the composition
    * `Dedup.semDeDupAuto` applies to the curation twin). Cells are
    * additionally clamped to `maxTrain/4` so the bounded training
    * sample keeps ≥ 4 vectors per cell. With `withPq` the layout also
    * carries write-time PQ codes under codebooks trained on the same
    * deterministic sample ([[ivfPqTopKIndexed]]'s compressed-scan
    * serving path).
    *
    * @return the trained centroid matrix (also persisted in the
    *         layout's params table — probes never need it)
    */
  def writeIvfLayoutAuto(corpus: DataFrame, path: String,
                         idCol: String, vecCol: String,
                         mult: Int = 4, iters: Int = 5,
                         maxTrain: Int = 10000,
                         withPq: Boolean = false,
                         pqM: Int = 8, pqK: Int = 16): Seq[Seq[Float]] = {
    val n = corpus.count()
    // clamp to the corpus size (same as knnGraphAuto) so a tiny corpus
    // builds a tiny layout instead of failing inside trainCentroids
    // with an unrelated "need >= cells training vectors" error
    val cells = math.min(n,
      math.min(ivfCellsFor(n, mult), math.max(1, maxTrain / 4)).toLong).toInt
    val cents = trainCentroids(corpus, idCol, vecCol, cells, iters, maxTrain)
    if (withPq) {
      val books = trainPqCodebooks(corpus, idCol, vecCol, pqM, pqK,
        iters, maxTrain)
      writeIvfLayout(corpus, path, idCol, vecCol, cents, books, pqM, pqK)
    } else writeIvfLayout(corpus, path, idCol, vecCol, cents)
    cents
  }

  /** The layout's persisted geometry (see [[writeIvfLayout]]). */
  private case class IvfLayoutParams(idCol: String, vecCol: String,
                                     centroids: Seq[Seq[Float]],
                                     pqCodebooks: Seq[Seq[Float]],
                                     pqM: Int, pqK: Int)

  private def readIvfLayoutParams(
      spark: org.apache.spark.sql.SparkSession,
      path: String): IvfLayoutParams = {
    // driver-side read through the shared generation-keyed params
    // cache (r20 — the Spark open cost ~150 ms per layout open; the
    // probe entries open the layout several times per lifecycle).
    // Legacy Spark-written params decode through the same reader
    // (MetaIOSpec pins the float-matrix byte-compat both directions).
    val pr =
      try Dedup.readParamsRow(spark, s"$path/params")
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"IVF layout at $path has no readable params table — " +
            "was it written by writeIvfLayout?", e)
      }
    // layout-version gate, shared with the dedup index family: an
    // absent stamp reads as v1 (the pre-lifecycle generation — fully
    // supported), an unknown future version refuses loudly instead of
    // silently mis-reading its tables
    Dedup.requireSupportedFormat(pr, path)
    // nested array elements come back as mutable ArraySeq — type them
    // as collection.Seq before converting, or the map's element cast
    // to immutable Seq throws
    def mat(field: String): Seq[Seq[Float]] =
      pr.getSeq[scala.collection.Seq[Float]](pr.fieldIndex(field))
        .map(_.toSeq).toSeq
    IvfLayoutParams(
      idCol = pr.getAs[String]("id_col"),
      vecCol = pr.getAs[String]("vec_col"),
      centroids = mat("centroids"),
      pqCodebooks = mat("pq_codebooks"),
      pqM = pr.getAs[Int]("pq_m"), pqK = pr.getAs[Int]("pq_k"))
  }

  /** The probed-cell IN-set as a partition-pruned scan of the layout:
    * the cell set is collected driver-side to become the scan's literal
    * partition predicate — bounded at O(queries × nprobe) ints (the
    * query side is the broadcast-small side by contract), never
    * corpus-sized.
    *
    * @return (query side with its probe cells exploded, pruned cells scan)
    */
  private def prunedCells(spark: org.apache.spark.sql.SparkSession,
                          path: String, p: IvfLayoutParams,
                          queries: DataFrame, qvecCol: String,
                          nprobe: Int): (DataFrame, DataFrame) = {
    val qb = queries.withColumn("cell",
      explode(GraftFunctions.ivfProbes(col(qvecCol), p.centroids, nprobe)))
    val probed = qb.select(col("cell")).distinct().collect().map(_.getInt(0))
    // empty query set → explicit always-false (isin() with an empty list
    // is a degenerate false in Spark; don't rely on it)
    val cellFilter =
      if (probed.isEmpty) lit(false)
      else col("cell").isin(probed.map(Int.box).toSeq: _*)
    // NOTE: a degenerate layout whose EVERY cell was purged has nothing
    // to serve — this read fails schema inference on the bare cells/
    // root (rebuild or append before serving; compaction itself
    // tolerates the state)
    //
    // Registry-bearing layout (every current build): read the probed ∩
    // registered cell dirs by EXPLICIT path — the cells/ root is never
    // readdir'd, so a probed dir that a racing readdir would silently
    // miss, or one genuinely absent for an instant inside
    // compactIvfLayout's rename swap, throws retryable (healed by
    // withServedProbe / the serving stream's per-batch retry) instead
    // of returning a silently-short candidate set. Pre-registry layouts
    // keep the listing-discovery read.
    val cellsPath = s"$path/cells"
    val registry = Dedup.readMemberDirs(
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, "cells")
    val cb0 = registry match {
      case Some(dirs) =>
        val want = probed.iterator.map(c => s"cell=$c").toSet
          .intersect(dirs).toSeq.sorted
        if (want.isEmpty)
          // no registered cell matches the probe: empty candidate set
          // (the root read only carries the schema; result is empty
          // whatever the listing returns)
          spark.read.parquet(cellsPath).filter(lit(false))
        else Dedup.readRegisteredDirs(spark, cellsPath, want, None)
          .filter(cellFilter)
      case None => spark.read.parquet(cellsPath).filter(cellFilter)
    }
    // pending takedowns are invisible to the probe IMMEDIATELY (the
    // broadcast anti-join below; partition pruning is unaffected — the
    // cell filter sits under it); their bytes are reclaimed by the next
    // compactIvfLayout. One driver-side existence probe when none pend.
    val cb = Dedup.readTombstones(spark, path).fold(cb0) { t =>
      cb0.join(broadcast(t.select(col("id").as("__tomb_id"))),
        col(p.idCol).try_cast("long") === col("__tomb_id"), "left_anti")
    }
    (qb, cb)
  }

  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int, nprobe: Int = 8,
                     excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(spark)
    val p = readIvfLayoutParams(spark, path)
    val (qb, cb) = prunedCells(spark, path, p, queries, qvecCol, nprobe)
    val withSim = cb.join(broadcast(qb), Seq("cell"))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col(p.vecCol), col(qvecCol)), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(p.idCol) =!= col(qidCol))
      else withSim
    rankTopK(filtered, p.idCol, qidCol, k)
  }

  /** [[ivfPqTopK]] against a persisted [[writeIvfLayout]] layout written
    * WITH PQ codebooks: the ADC stage scans (id, codes) of the probed
    * cell directories only — PartitionFilters prunes WHICH directories
    * are listed, parquet column pruning keeps the 4·dim-byte vector
    * column unread — and only the exact re-rank stage joins the
    * shortlist (O(queries·rerank) rows) back to the full-precision
    * vectors of the same pruned cells. Codes were encoded once at write
    * time under the layout's own persisted codebooks, so the probe
    * cannot encode under mismatched geometry. Result is bit-identical
    * to the live [[ivfPqTopK]] under the same models.
    */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                       path: String, queries: DataFrame,
                       qidCol: String, qvecCol: String,
                       topK: Int, nprobe: Int = 8, rerank: Int = 0,
                       excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(spark)
    val p = readIvfLayoutParams(spark, path)
    require(p.pqCodebooks.nonEmpty,
      s"IVF layout at $path was written without PQ codebooks — " +
        "rebuild with writeIvfLayout(..., pqCodebooks, pqM, pqK) " +
        "or probe with ivfTopKIndexed")
    val (qb, cb) = prunedCells(spark, path, p, queries, qvecCol, nprobe)
    val coded = cb.select(col(p.idCol), col("cell"), col("codes"))
    val withSim = coded.join(broadcast(qb), Seq("cell"))
      .withColumn("sim", round(GraftFunctions.pqAdc(
        col("codes"), col(qvecCol), p.pqCodebooks, p.pqM, p.pqK), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(p.idCol) =!= col(qidCol))
      else withSim
    if (rerank <= topK) rankTopK(filtered, p.idCol, qidCol, topK)
    else rerankExact(rankTopK(filtered, p.idCol, qidCol, rerank),
      cb.select(col(p.idCol), col(p.vecCol)), queries,
      p.idCol, p.vecCol, qidCol, qvecCol, topK)
  }

  /** Run a probe ACTION against a persisted serving layout under the
    * layout family's no-quiesce read contract — the BATCH twin of
    * `annServeStream`'s per-batch retry, so a direct
    * [[ivfTopKIndexed]]/[[ivfPqTopKIndexed]] caller racing a
    * concurrent [[compactIvfLayout]]'s per-cell rename-swap (a cell
    * file listed before the swap, gone at read time) needs no
    * coordination with the layout's maintenance owner. Retries when
    * the failure chain carries a genuine missing-file error; anything
    * else propagates immediately. Construct the probe INSIDE the body
    * (a fresh `ivfTopKIndexed(...)` call per attempt, not a captured
    * frame) so the retry re-opens the post-swap generation. Results
    * are bit-identical whichever attempt wins: a compaction folds
    * files and physically purges only rows the probe's pending-
    * tombstone anti-join already hides. Spec-pinned by the live
    * concurrent-compaction case in `IvfLayoutLifecycleSpec`; shares
    * `Layouts.retryingRead` with the z-order family, so both layout
    * families carry one read contract. */
  def withServedProbe[T](attempts: Int = 5)(body: => T): T =
    graft.sources.Layouts.retryingRead(attempts)(body)

  // ---- IVF layout lifecycle (append / takedown / compaction) ----
  //
  // The serving layout reuses the dedup index family's shared lifecycle
  // core (Dedup.appendTombstones / readTombstones / renameSwap / scrub
  // markers / epoch fence / format gate), so a swap-window or
  // tombstone-semantics fix there applies here by construction. What it
  // deliberately does NOT have: a ledger (no governed stream owns it —
  // annServeStream replays are pure recomputation), occupancy (no
  // bucket caps), quarantine (no id contract beyond long-castable).

  /** Append a batch of NEW vectors to a persisted layout under its OWN
    * frozen quantizer: cell assignment is a pure function of (vector,
    * centroids), so append-then-probe ≡ rebuild-then-probe bit-for-bit
    * (spec-proven). A PQ-coded layout encodes the batch under its stored
    * codebooks. The batch schema must match the layout's corpus schema
    * (the writer persists full corpus rows); ids already in the layout
    * are the CALLER's contract to exclude — the intended feed is a
    * governed dedup loop's novel survivors, which are new by
    * construction. Counts as a mutation under the epoch fence; appended
    * files accrete per cell until [[compactIvfLayout]] folds them.
    */
  def appendIvfLayout(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    GraftFunctions.register(spark)
    val p = readIvfLayoutParams(spark, path)
    require(batch.columns.contains(p.idCol) && batch.columns.contains(p.vecCol),
      s"appendIvfLayout: batch must carry the layout's (${p.idCol}, " +
        s"${p.vecCol}) columns; got ${batch.columns.mkString(", ")}")
    val root = new org.apache.hadoop.fs.Path(s"$path/cells")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Dedup.recoverScrubLeftovers(fs, root)
    Dedup.claimEpoch(spark, path)
    val celled = batch.withColumn("cell",
      element_at(GraftFunctions.ivfProbes(col(p.vecCol), p.centroids, 1), 1))
    val coded =
      if (p.pqCodebooks.isEmpty) celled
      else celled.withColumn("codes",
        GraftFunctions.pqEncode(col(p.vecCol), p.pqCodebooks, p.pqM, p.pqK))
    // repartition BEFORE the partitionBy append: one file per occupied
    // cell per append, not (tasks × cells) — the same small-files bound
    // as the index band appends
    coded.repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(root.toString)
    // register newly-occupied cell dirs AFTER the data landed (union;
    // fence-held, so the listing is quiescent — see Dedup's registry)
    Dedup.syncMemberDirs(spark, path, "cells", replace = false)
  }

  /** Delete (take down) ids from a persisted IVF layout — the takedown /
    * privacy-delete path for the SERVED ANN corpus: probes stop
    * returning the deleted vectors at the NEXT open (pending-tombstone
    * anti-join, O(tombstones), zero when none pend); their bytes are
    * physically reclaimed by the next [[compactIvfLayout]]. Deleting ids
    * the layout does not contain is a harmless no-op. Counts as a
    * mutation under the epoch fence. An overwrite [[writeIvfLayout]]
    * rebuild clears pending tombstones (the new corpus simply omits the
    * rows), exactly like the dedup index rebuilds.
    */
  def deleteFromIvfLayout(spark: org.apache.spark.sql.SparkSession,
                          path: String, ids: DataFrame,
                          idCol: String): Unit = {
    readIvfLayoutParams(spark, path) // validates the layout + format gate
    Dedup.appendTombstones(spark, path, ids, idCol)
  }

  /** [[deleteFromIvfLayout]] for a driver-side id list. */
  def deleteFromIvfLayout(spark: org.apache.spark.sql.SparkSession,
                          path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    deleteFromIvfLayout(spark, path, ids.toDF("id"), "id")
  }

  /** Compact a persisted IVF layout: (1) physically purge pending
    * tombstones — ONE id-and-cell column-pruned scan finds the hit
    * cells, then ONE bulk rewrite job (its read partition-pruned to
    * exactly those `cell=K/` directories) re-materializes them without
    * the deleted rows, and each rewritten directory swaps in
    * driver-side. The takedown rewrite is O(hit-cell BYTES) in one
    * Spark job plus O(hit cells) renames — never a corpus rewrite, and
    * never a Spark job per directory (a 1000-cell takedown as
    * sequential per-dir jobs would be a driver-job storm; measured 20×
    * slower than the bulk form at sf0.1). A fully-deleted cell's
    * directory is dropped. The tombstone files listed BEFORE the
    * rewrite are folded after every hit cell swapped (a delete landing
    * mid-compaction stays pending). (2) Fold append-fragmented cells —
    * directories holding more than `maxFilesPerCell` data files — with
    * the same bulk rewrite (`repartition(cell)` → one file per
    * occupied cell, the build's own layout).
    *
    * Crash windows: the bulk temp root is dropped on entry (its
    * tombstones are still pending — a re-run recomputes it verbatim);
    * a crash mid-swap heals through the scrub-marker sweep at the next
    * mutation or compact (markers are invisible to probes).
    * Re-running is idempotent; zero Spark jobs when nothing pends and
    * nothing is fragmented.
    *
    * @return number of rows physically purged
    */
  def compactIvfLayout(spark: org.apache.spark.sql.SparkSession,
                       path: String, maxFilesPerCell: Int = 8): Long = {
    val p = readIvfLayoutParams(spark, path)
    val root = new org.apache.hadoop.fs.Path(s"$path/cells")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Dedup.recoverScrubLeftovers(fs, root)
    fs.delete(bulkTmpRoot(path), true) // orphaned bulk temp: re-runnable
    // listed BEFORE the purge reads materialize: fold at most these
    val tombFiles = Dedup.listTombstoneFiles(spark, path)
    var purged = 0L
    // a layout whose every cell was fully purged earlier has no cell
    // directories left — schema inference on the bare root would throw;
    // with no rows there is nothing to purge, only files to fold
    def hasCellDirs = fs.exists(root) && fs.listStatus(root)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    Dedup.readTombstones(spark, path).foreach { t =>
      Dedup.claimEpoch(spark, path)
      if (hasCellDirs) {
        val tomb = t.select(col("id").as("__tomb_id")).localCheckpoint()
        val hits = spark.read.parquet(root.toString)
          .select(col(p.idCol).try_cast("long").as("__row_id"), col("cell"))
          .join(broadcast(tomb), col("__row_id") === col("__tomb_id"),
            "left_semi")
          .groupBy(col("cell")).agg(count(lit(1)).as("n")).collect()
        if (hits.nonEmpty) {
          purged = hits.map(_.getAs[Long]("n")).sum
          rewriteCells(spark, fs, path, root,
            hits.map(_.get(0).toString.toInt).toSeq, p, Some(tomb))
        }
        graft.plans.Checkpoints.free(tomb)
      }
      // every hit cell is rewritten — fold the pre-listed tombstone
      // files (a crash mid-fold leaves already-purged ids pending: the
      // probe anti-join and a re-run are both no-ops on them)
      tombFiles.foreach(f => require(fs.delete(f, false),
        s"compactIvfLayout: could not fold tombstone file $f"))
    }
    // defrag pass AFTER the purge (purge rewrites are already compact)
    val frag =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.filter { s =>
        s.isDirectory && s.getPath.getName.startsWith("cell=") &&
          fs.listStatus(s.getPath).count { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          } > maxFilesPerCell
      }.map(_.getPath.getName.stripPrefix("cell=").toInt)
    if (frag.nonEmpty) {
      Dedup.claimEpoch(spark, path)
      rewriteCells(spark, fs, path, root, frag, p, None)
    }
    purged
  }

  private def bulkTmpRoot(path: String) =
    new org.apache.hadoop.fs.Path(path, "__compacting_cells")

  /** Re-materialize the given cells in ONE Spark job (read partition-
    * pruned to them, tombstones anti-joined when purging, written
    * `partitionBy(cell)` into the bulk temp root), then swap each
    * directory in driver-side with the scrub-marker discipline. A cell
    * with no rows retained produces no temp directory and is dropped.
    * `tomb` column contract: `__tomb_id`. */
  private def rewriteCells(spark: org.apache.spark.sql.SparkSession,
                           fs: org.apache.hadoop.fs.FileSystem,
                           path: String,
                           root: org.apache.hadoop.fs.Path,
                           cells: Seq[Int], p: IvfLayoutParams,
                           tomb: Option[DataFrame]): Unit = {
    val tmpRoot = bulkTmpRoot(path)
    val rows = spark.read.parquet(root.toString)
      .filter(col("cell").isin(cells.map(Int.box): _*))
    val retained = tomb.fold(rows)(t => rows.join(broadcast(t),
      col(p.idCol).try_cast("long") === col("__tomb_id"), "left_anti"))
    retained.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(tmpRoot.toString)
    cells.foreach { c =>
      val dirName = s"cell=$c"
      val dir = new org.apache.hadoop.fs.Path(root, dirName)
      val tmp = new org.apache.hadoop.fs.Path(tmpRoot, dirName)
      val old = new org.apache.hadoop.fs.Path(root,
        Dedup.ScrubOldPrefix + dirName)
      if (!fs.exists(tmp)) {
        // every row of the cell was taken down: no directory at all
        // beats an empty one (partition discovery skips it entirely).
        // Unregister BEFORE the drop — the registry must never name a
        // permanently-absent dir (a crash in between leaves an
        // unregistered dir of all-tombstoned rows: invisible either way)
        Dedup.deregisterMemberDirs(spark, path, "cells", Set(dirName))
        require(fs.delete(dir, true),
          s"compactIvfLayout: could not drop fully-purged $dir")
      } else {
        require(fs.rename(dir, old),
          s"compactIvfLayout: could not move aside $dir -> $old")
        require(fs.rename(tmp, dir),
          s"compactIvfLayout: could not swap $tmp -> $dir")
        require(fs.delete(old, true),
          s"compactIvfLayout: could not remove $old")
      }
    }
    fs.delete(tmpRoot, true)
    // post-swap replace-sync under the held fence: records the new
    // generation and heals any registration a crashed mutator missed
    Dedup.syncMemberDirs(spark, path, "cells", replace = true)
  }

  /** Symmetric per-vector int8 quantization of a float-vector column:
    * scale = 127 / max|x|, element = floor(x·scale + 0.5) ∈ [-127, 127]
    * (half-up-toward-+inf in BOTH engines by construction — `round()`
    * tie rules differ across engines, `floor(x + 0.5)` does not). The
    * all-zero vector quantizes to zeros; any other vector keeps a ±127
    * element, so quantized cosine never divides by zero unless the
    * input was zero.
    *
    * At 100 TB this is the memory/IO lever for ANN: int8 elements
    * dictionary/bit-pack to ~1 byte in parquet vs 4 for floats, and a
    * quantized corpus fits 4× more vectors per executor. Emitted as
    * `array<float>` (exact for |v| ≤ 127) so the codegen'd
    * [[graft.functions.CosineSimilarity]] kernel — and every top-k
    * operator built on it — runs on quantized vectors unchanged.
    */
  def quantizeInt8(vec: Column): Column =
    graft.functions.TextFunctions.letBound(
      array_max(transform(vec, x => abs(x)))) { amax =>
      when(amax > 0,
        transform(vec, x => floor(x * (lit(127.0) / amax) + lit(0.5))))
        .otherwise(transform(vec, _ => lit(0L)))
        .cast("array<float>")
    }

  /** [[bruteForceTopK]] over int8-quantized corpus and query vectors —
    * exact integer arithmetic end to end (integer dot products stay well
    * below 2^53), so the ranking is deterministic and engine-portable,
    * unlike raw-float ANN scores which only round-trip because the
    * kernels accumulate identically.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String,
                    qidCol: String, qvecCol: String,
                    k: Int, excludeSelf: Boolean = true): DataFrame =
    bruteForceTopK(
      corpus.withColumn(vecCol, quantizeInt8(col(vecCol))),
      queries.withColumn(qvecCol, quantizeInt8(col(qvecCol))),
      idCol, vecCol, qidCol, qvecCol, k, excludeSelf)

  /** Deterministic product-quantization codebooks: `m` subspaces of
    * dim/m dims, `k` centroids each, trained per subspace with the same
    * bounded driver-side Lloyd shape as [[trainCentroids]] but under L2
    * (the PQ objective; subvectors are NOT normalized). Init = `k`
    * evenly spaced subvectors of the id-ordered sample; empty cells keep
    * their centroid; no RNG anywhere. The training sample follows the
    * SAMPLING REGIME documented on [[trainCentroids]]: corpora past
    * 4·maxTrain rows switch from the exact lowest-id window to a
    * deterministic hash-pre-filtered window.
    *
    * @return (m·k)×subDim matrix, rows ordered (subspace-major, then
    *         centroid id) — the layout [[graft.functions.PqEncode]] and
    *         [[graft.functions.PqAdcCosine]] index
    */
  def trainPqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
                       m: Int = 8, k: Int = 16, iters: Int = 5,
                       maxTrain: Int = 10000): Seq[Seq[Float]] = {
    val sample = trainSample(emb, idCol, vecCol, maxTrain)
    require(sample.length >= k, s"need >= $k training vectors, got ${sample.length}")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m

    (0 until m).flatMap { s =>
      val subs = sample.map { v =>
        Array.tabulate(subDim)(i => v(s * subDim + i).toDouble)
      }
      val stride = subs.length / k
      var cents = Array.tabulate(k)(c => subs(c * stride).clone())
      (0 until iters).foreach { _ =>
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        subs.foreach { x =>
          var bestC = 0; var bestD = Double.MaxValue
          var ci = 0
          while (ci < k) {
            var d = 0.0; var i = 0
            while (i < subDim) {
              val diff = x(i) - cents(ci)(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; bestC = ci }
            ci += 1
          }
          var i = 0
          while (i < subDim) { sums(bestC)(i) += x(i); i += 1 }
          counts(bestC) += 1
        }
        cents = Array.tabulate(k)(ci =>
          if (counts(ci) == 0) cents(ci)
          else sums(ci).map(_ / counts(ci)))
      }
      cents.map(_.map(_.toFloat).toSeq).toSeq
    }
  }

  /** Approximate top-k via product quantization with ADC scoring: the
    * corpus is encoded ONCE to m small ints per vector (a narrow
    * codegen'd projection — 16–64× less data than the float vectors),
    * queries stay full precision, and each candidate is scored as
    * `cosine(query, reconstruction(codes))` by the codegen'd
    * [[graft.functions.PqAdcCosine]] kernel. Ranking is the bounded
    * TopKByScore aggregate (map-side partials, shuffle = O(k×partitions)).
    *
    * Scale shape (100 TB): this is the SCAN-compression path, orthogonal
    * to LSH/IVF candidate pruning — the full corpus is still visited, but
    * as m-byte codes instead of 4·dim-byte vectors, so the scan is
    * IO-bound at a fraction of the bytes; compose with [[ivfTopK]]'s
    * cells for IVF-PQ when both levers are needed. The codebook is a
    * plan literal; executors need no side input.
    *
    * `rerank > topK` enables the standard two-stage pipeline: ADC
    * shortlists `rerank` candidates per query from the compressed scan,
    * then ONLY those rows re-join the full-precision vectors (a selective
    * join keyed on id — O(queries·rerank) rows, independent of corpus
    * size) and exact cosine re-ranks the final `topK`. This recovers most
    * of the recall lost to quantization while still never scanning the
    * float corpus.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String,
             qidCol: String, qvecCol: String,
             topK: Int, codebooks: Seq[Seq[Float]], m: Int, k: Int,
             rerank: Int = 0, excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val coded = corpus.select(col(idCol),
      GraftFunctions.pqEncode(col(vecCol), codebooks, m, k).as("__codes"))
    val joined = coded.crossJoin(broadcast(queries))
    val withSim = joined.withColumn("sim",
      round(GraftFunctions.pqAdc(col("__codes"), col(qvecCol), codebooks, m, k), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(idCol) =!= col(qidCol)) else withSim
    if (rerank <= topK) rankTopK(filtered, idCol, qidCol, topK)
    else rerankExact(rankTopK(filtered, idCol, qidCol, rerank),
      corpus, queries, idCol, vecCol, qidCol, qvecCol, topK)
  }

  /** Exact-cosine re-rank of an ADC/LSH shortlist: only the shortlisted
    * (query, id) pairs — O(queries·rerank) rows, independent of corpus
    * size — re-join the full-precision vectors.
    */
  private def rerankExact(shortlist: DataFrame,
                          corpus: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String,
                          qidCol: String, qvecCol: String,
                          topK: Int): DataFrame = {
    val exact = shortlist
      .select(col(qidCol), col(idCol))
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries), Seq(qidCol))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col(vecCol), col(qvecCol)), 6))
    rankTopK(exact, idCol, qidCol, topK)
  }

  /** Semantic decontamination: for every corpus vector, the maximum
    * cosine against ANY benchmark vector, plus the `contaminated` flag
    * (max ≥ tau) — the embedding-space twin of the n-gram overlap
    * decontamination ([[TextOps.contaminationPairs]]): a paraphrased
    * benchmark row that shares no n-grams still sits close in embedding
    * space, and training on it leaks the benchmark.
    *
    * Scale shape: the benchmark side is broadcast (benchmarks are small
    * by construction), the corpus is scanned ONCE with the codegen'd
    * cosine kernel, and the per-id max is a decomposable aggregate with
    * map-side partials. For a benchmark too large to broadcast, bucket
    * the pair generation with [[lshTopK]]'s SRP tables and keep only the
    * max per corpus id — the flag semantics are unchanged.
    */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            benchVecCol: String, tau: Double): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.crossJoin(broadcast(bench.select(col(benchVecCol))))
      .groupBy(col(idCol))
      .agg(max(round(GraftFunctions.cosineSim(col(vecCol), col(benchVecCol)), 6))
        .as("max_sim"))
      .select(col(idCol), col("max_sim"),
        when(col("max_sim") >= tau, lit(1L)).otherwise(lit(0L))
          .as("contaminated"))
      .orderBy(col(idCol))
  }

  /** IVF-PQ top-k — the classic composed index (coarse cells prune WHICH
    * vectors are visited; PQ codes compress HOW they are read): the
    * corpus carries (cell, codes) — one narrow kernel projection each —
    * queries probe `nprobe` cells, candidates meet in a hash join on the
    * cell id, ADC scores the codes, and the shortlist re-ranks exactly.
    *
    * Scale shape (100 TB): a query visits ~nprobe/c of the corpus
    * (IVF pruning) AND each visited row is m small ints instead of
    * 4·dim bytes (PQ compression) — the two levers multiply. No corpus
    * replication (cells are disjoint); both the quantizer and the
    * codebook are plan literals, so executors need no side input.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String,
                qidCol: String, qvecCol: String,
                topK: Int, centroids: Seq[Seq[Float]], nprobe: Int,
                codebooks: Seq[Seq[Float]], m: Int, k: Int,
                rerank: Int = 0, excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val coded = corpus.select(col(idCol),
      element_at(GraftFunctions.ivfProbes(col(vecCol), centroids, 1), 1)
        .as("cell"),
      GraftFunctions.pqEncode(col(vecCol), codebooks, m, k).as("__codes"))
    val qb = queries.withColumn("cell",
      explode(GraftFunctions.ivfProbes(col(qvecCol), centroids, nprobe)))
    val joined = coded.join(broadcast(qb), Seq("cell"))
    val withSim = joined.withColumn("sim",
      round(GraftFunctions.pqAdc(col("__codes"), col(qvecCol), codebooks, m, k), 6))
    val filtered =
      if (excludeSelf) withSim.filter(col(idCol) =!= col(qidCol)) else withSim
    if (rerank <= topK) rankTopK(filtered, idCol, qidCol, topK)
    else rerankExact(rankTopK(filtered, idCol, qidCol, rerank),
      corpus, queries, idCol, vecCol, qidCol, qvecCol, topK)
  }
}
