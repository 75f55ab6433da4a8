package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.Checkpoints

/** Connected components over a near-dup pair list — the step that turns
  * pairwise `(id_a, id_b, score)` evidence (MinHash, SimHash, Jaccard,
  * embedding cosine) into dedup groups: every document gets the minimum
  * id reachable through the pair graph as its `cluster`, and "keep one
  * per cluster" becomes a trivial filter (`id = cluster`).
  *
  * Algorithm: iterative min-label propagation. Each round, every node
  * takes the min of its own label and its neighbors' labels — one hash
  * join + one aggregation per round, all decomposable, edges hash-
  * partitioned. Rounds needed = graph diameter; near-dup components are
  * overwhelmingly tiny cliques (diameter 1-2), so this converges in a
  * couple of rounds, with an exact convergence check (no fixed round
  * count guessing). This operator MATERIALIZES per round (it is a
  * multi-pass graph computation, like any Pregel-style run): labels are
  * `localCheckpoint`ed each iteration — persist alone is NOT enough,
  * because the logical plan would still chain across iterations and
  * re-analysis/AQE cost grows superlinearly with rounds (measured: a
  * 10-round run wedged for minutes in plan processing before the
  * checkpoint truncation, milliseconds after).
  *
  * At 100 TB: shuffle volume per round is O(E) small (id, id) rows; the
  * driver never touches per-node data (only the converged? count). For
  * adversarial long-chain graphs the round count grows with the chain
  * length — the classic fix (large-star/small-star, O(log n) rounds) is
  * the upgrade path documented here, not needed for near-dup workloads.
  */
object Clustering {

  /** (id, cluster) for every id appearing in `pairs`; cluster = min id of
    * the component. Deterministic, engine-portable (DuckDB twin = a
    * recursive transitive-closure CTE).
    */
  def nearDupClusters(pairs: DataFrame, idACol: String = "id_a",
                      idBCol: String = "id_b", maxIter: Int = 100): DataFrame = {
    val e0 = pairs.select(col(idACol).cast("long").as("a"),
      col(idBCol).cast("long").as("b"))
    val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint (eager) truncates the logical plan per round; a
    // restart-tolerant deployment would use checkpoint() with a
    // checkpoint dir instead.
    var ckpt = edges.groupBy(col("a"))
      .agg(min(col("b")).as("nmin"))
      .select(col("a").as("id"), least(col("a"), col("nmin")).as("lbl"))
      .localCheckpoint()
    var labels = ckpt

    var iter = 0
    var converged = false
    var prev: DataFrame = null
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("b"), col("lbl")), "b")
        .groupBy(col("a"))
        .agg(min(col("lbl")).as("nbl"))
        .select(col("a").as("id"), col("nbl"))
      // The pre-round label rides along INTO the checkpoint so the
      // convergence check is a filter+count over the already-materialized
      // local blocks — fusing it into the propagation job instead of
      // paying a second labels⋈next shuffle per round.
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("lbl"),
          col("lbl").as("__old"))
        .localCheckpoint()
      val changed = next.filter(col("lbl") < col("__old")).count()
      // previous round's checkpointed blocks are no longer referenced.
      // Checkpoints.free, NOT Dataset.unpersist: unpersist() is a silent
      // no-op on a checkpointed frame (CacheManager only tracks cached
      // queries) — the probe-leak spec in ClusteringSpec counts the
      // persisted RDDs to prove the blocks actually go away. Safe here
      // because a freed round is never read again (a local checkpoint
      // has no lineage to recompute from).
      if (prev != null) Checkpoints.free(prev)
      prev = ckpt
      ckpt = next
      labels = next.select(col("id"), col("lbl"))
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (prev != null) Checkpoints.free(prev)
    if (!converged) {
      // The final round's checkpointed blocks are about to become
      // unreachable — nobody will consume `labels` on the throw path.
      // Without this, nearDupClustersAuto's ROUTINE fallback (deep graph
      // -> probe throws -> star contraction) would leak probeRounds'
      // worth of localCheckpoint blocks per call until the
      // ContextCleaner happened to GC the references.
      Checkpoints.free(ckpt)
      throw new IllegalStateException(
        s"nearDupClusters did not converge within $maxIter rounds " +
          "(component diameter exceeds maxIter) — raise maxIter; a " +
          "silently partial clustering would under-deduplicate")
    }
    labels.select(col("id"), col("lbl").as("cluster")).orderBy(col("id"))
  }

  /** Representative per cluster: the row whose id IS the cluster label —
    * the "keep one copy" step of a dedup pipeline.
    */
  def representatives(clustered: DataFrame): DataFrame =
    clustered.filter(col("id") === col("cluster"))

  /** Auto-selecting clustering — the cheap "diameter probe": run min-label
    * propagation for at most `probeRounds` rounds (it converges in 2–4 on
    * the tiny-clique graphs near-dup workloads produce, at half the
    * shuffles per round of star contraction); if the graph turns out
    * deeper than the probe (mutation chains, citation paths), fall back
    * to star contraction, which is O(log n) rounds on ANY shape. The
    * probe's worst case is `probeRounds` cheap rounds of wasted work on a
    * deep graph; the common shallow case pays nothing — the fast path IS
    * the answer. Same contract as both underlying methods: (id, cluster)
    * with cluster = min id of the component.
    */
  def nearDupClustersAuto(pairs: DataFrame, idACol: String = "id_a",
                          idBCol: String = "id_b",
                          probeRounds: Int = 6): DataFrame =
    try nearDupClusters(pairs, idACol, idBCol, maxIter = probeRounds)
    catch {
      case e: IllegalStateException
          if e.getMessage != null && e.getMessage.contains("did not converge") =>
        nearDupClustersStar(pairs, idACol, idBCol)
    }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the O(log n)-round scale path promised in
    * [[nearDupClusters]]'s scaladoc. Same contract: (id, cluster) with
    * cluster = min id of the component.
    *
    * Per round, two edge rewrites, each one agg + one join on the node id
    * (same hash partitioning, so the exchange is reused within a round):
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m(u) = min(N(u) ∪ {u}) — long chains halve;
    *  - small-star(u): every neighbor v < u (and u itself) attaches to the
    *    min — stars flatten.
    * The fixpoint of both rewrites is a disjoint union of stars rooted at
    * each component's minimum, reached in O(log n) rounds on ANY graph —
    * including the adversarial long-chain shapes where min-label
    * propagation needs diameter rounds. Label propagation stays the
    * default for near-dup workloads (tiny cliques, 2-3 rounds, half the
    * shuffles per round); this is the variant you switch to when
    * components can be deep (URL graphs, citation chains).
    *
    * Convergence check is EXACT (count equality + anti-join emptiness),
    * not a fingerprint — a probabilistic check could silently terminate
    * early and under-merge. Edges are `localCheckpoint`ed per round for
    * the same plan-truncation reason documented on [[nearDupClusters]].
    */
  def nearDupClustersStar(pairs: DataFrame, idACol: String = "id_a",
                          idBCol: String = "id_b", maxIter: Int = 40): DataFrame = {
    val e0 = pairs
      .select(col(idACol).cast("long").as("x"), col(idBCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
    // canonical direction: u (larger) -> v (smaller)
    var edges = e0
      .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
      .distinct()
      .localCheckpoint()

    var iter = 0
    var converged = false
    var prev: DataFrame = null
    // carried across rounds: this round's `next.count()` IS the next
    // round's `edges.count()` — recomputing it was one redundant job per
    // round (r19)
    var edgesCount = edges.count()
    while (!converged && iter < maxIter) {
      // large-star over the symmetrized adjacency
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(col("u"), min(col("v"))).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star over the re-canonicalized result
      val dir = large.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins2 = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = dir.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      // exact fixpoint test over two checkpointed edge sets
      val nextCount = next.count()
      converged = nextCount == edgesCount &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edgesCount = nextCount
      // Checkpoints.free (see nearDupClusters): Dataset.unpersist is a
      // no-op on checkpointed frames; the freed round is never re-read.
      if (prev != null) Checkpoints.free(prev)
      prev = edges
      edges = next
      iter += 1
    }
    if (prev != null) Checkpoints.free(prev)
    if (!converged) {
      Checkpoints.free(edges)
      throw new IllegalStateException(
        s"nearDupClustersStar did not converge within $maxIter rounds — " +
          "raise maxIter; a silently partial clustering would " +
          "under-deduplicate")
    }
    // fixpoint = disjoint stars: every non-root points at its component
    // min; roots point at themselves.
    edges.select(col("u").as("id"), col("v").as("cluster"))
      .union(edges.select(col("v"), col("v")).distinct())
      .distinct()
      .orderBy(col("id"))
  }
}
