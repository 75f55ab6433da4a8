package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

/** SemDeDup (Dedup.semDeDup): frozen-quantizer cell assignment +
  * within-cell greedy-star cosine dedup.
  */
class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  // two axis-aligned unit centroids: cell 0 = x-dominant, cell 1 = y-dominant
  private val centroids: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))

  test("keeps one representative per within-cell dup group") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.05f)),  // cell 0, group head
      (2L, Seq(1.0f, 0.05f)),  // exact dup of 1 -> dropped
      (3L, Seq(0.7f, 0.4f)),   // cell 0, NOT a near-dup of 1 at 0.995
      (4L, Seq(0.1f, 1.0f)),   // cell 1, group head
      (5L, Seq(0.1f, 1.0f)),   // exact dup of 4 -> dropped
      (6L, Seq(0.999f, 0.05f)) // near-dup of 1 and 2 -> dropped (star)
    ).toDF("id", "v")
    val kept = Dedup.semDeDup(emb, "id", "v", centroids, threshold = 0.995)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(kept.keySet == Set(1L, 3L, 4L))
    assert(kept(1L) == 0 && kept(3L) == 0 && kept(4L) == 1)
  }

  test("cluster boundary blocks cross-cell comparisons") {
    // identical direction, but straddling the cell boundary: both kept
    val emb = Seq(
      (1L, Seq(1.0f, 0.9f)), // dot 1.0 vs 0.9 -> cell 0
      (2L, Seq(0.9f, 1.0f))  // dot 0.9 vs 1.0 -> cell 1
    ).toDF("id", "v")
    val kept = Dedup.semDeDup(emb, "id", "v", centroids, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("maxCell cap bounds the join; capped-out rows pass through") {
    val emb = (1L to 5L).map(i => (i, Seq(1.0f, 0.0f))).toDF("id", "v")
    val kept = Dedup.semDeDup(emb, "id", "v", centroids, threshold = 0.9,
      maxCell = 3)
      .collect().map(_.getLong(0)).toSet
    // rows 1-3 are examined (1 kept, 2-3 dropped); 4-5 are beyond the cap
    // and pass through unexamined
    assert(kept == Set(1L, 4L, 5L))
  }

  test("adversarial single hot cell: every vector in ONE cell, cap far " +
      "below occupancy — capped semantics exact, overflow untouched") {
    // The SemDeDup worst case: a degenerate quantizer assignment packs
    // the whole corpus into one IVF cell (occupancy 300 vs cap 40), the
    // shape that would make the within-cell join quadratic in the corpus
    // without the cap. Structure inside the cell: 100 three-member
    // near-dup groups (exact duplicates, cos = 1), all x-dominant so
    // every row lands in cell 0.
    // y spread 0.12 apart keeps adjacent direction classes at cos ≤
    // 0.993 (< threshold) while every class stays x-dominant (cell 0)
    val emb = (0L until 300L).map { i =>
      val g = i / 3 // dup group
      (i, Seq(1.0f, (g % 7).toFloat * 0.12f)) // class direction, cos=1 within
    }.toDF("id", "v")
    val cap = 40
    val kept = Dedup.semDeDup(emb, "id", "v", centroids, threshold = 0.9999,
        maxCell = cap)
      .collect().map(_.getLong(0)).toSet

    // Documented cap semantics: only the cap LOWEST ids are examined;
    // the greedy star runs exactly over that universe; every row beyond
    // the cap passes through unexamined. Oracle: naive all-pairs over
    // ids 0..39 at the same threshold.
    val universe = (0L until cap.toLong)
    val dropped = (for {
      a <- universe; b <- universe
      if a < b && (a / 3 == b / 3 || {
        // same direction class (g % 7) → cos 1 across groups too
        (a / 3) % 7 == (b / 3) % 7
      })
    } yield b).toSet
    val expected = (0L until 300L).toSet -- dropped
    assert(kept == expected,
      s"capped hot-cell semantics diverge (missing=${expected -- kept}, " +
        s"extra=${kept -- expected})")
    // sanity: the cap actually bit — uncapped, the 0.9999 threshold
    // would drop ~every non-representative row
    val keptUncapped = Dedup.semDeDup(emb, "id", "v", centroids,
        threshold = 0.9999).collect().length
    assert(keptUncapped < kept.size,
      "fixture must distinguish capped from uncapped behavior")
  }

  test("semDedupCellsFor: cells track the corpus at constant occupancy") {
    // the growth law that keeps Σ cell² linear in n
    val a = Dedup.semDedupCellsFor(1000000L, targetOccupancy = 64,
      minCells = 1, maxCells = Int.MaxValue)
    val b = Dedup.semDedupCellsFor(100000000L, targetOccupancy = 64,
      minCells = 1, maxCells = Int.MaxValue)
    assert(a == 15625 && b == 1562500, s"sizing law broken: $a, $b")
    assert(b == 100 * a, "cells must scale linearly with the corpus")
    // clamps: tiny corpora floor at minCells; huge ones cap at maxCells
    assert(Dedup.semDedupCellsFor(10L) == 32)
    assert(Dedup.semDedupCellsFor(Long.MaxValue) == (1 << 16))
    intercept[IllegalArgumentException](Dedup.semDedupCellsFor(100L, 0))
  }

  test("semDeDupAuto equals the manual sizing-law + train + dedup composition") {
    import graft.operators.Similarity
    // deterministic spread of near-dup groups across the embedding space
    val emb = (1L to 120L).map { i =>
      val g = i / 2 // 60 two-member exact-dup groups
      val a = ((g * 37 + 11) % 19).toFloat / 19f + 0.05f
      val b = ((g * 53 + 7) % 23).toFloat / 23f + 0.05f
      (i, Seq(a, b))
    }.toDF("id", "v")
    val auto = Dedup.semDeDupAuto(emb, "id", "v", threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // the documented composition, by hand
    val cells = Dedup.semDedupCellsFor(120L, 64)
    val cents = Similarity.trainCentroids(emb, "id", "v", c = cells,
      iters = 3, maxTrain = math.max(cells * 4, 10000))
    val manual = Dedup.semDeDup(emb, "id", "v", cents, threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(auto == manual, "auto path diverges from the documented composition")
    // and it actually deduped: every surviving id is its group's min id
    // unless its twin landed in a different cell (cluster-scoped semantics)
    assert(auto.size < 120, "nothing was deduplicated")
  }

  test("equals the naive per-cell all-pairs formulation") {
    // deterministic pseudo-random 2-d vectors across both cells
    val emb = (1L to 40L).map { i =>
      val a = ((i * 37 + 11) % 19).toFloat / 19f
      val b = ((i * 53 + 7) % 23).toFloat / 23f
      (i, Seq(a + 0.05f, b + 0.05f))
    }.toDF("id", "v")
    val thr = 0.97
    val kept = Dedup.semDeDup(emb, "id", "v", centroids, thr)
      .collect().map(_.getLong(0)).toSet

    GraftFunctions.register(spark)
    val assigned = emb.select(col("id"),
        col("v").cast("array<float>").as("v"))
      .withColumn("cell",
        element_at(GraftFunctions.ivfProbes(col("v"), centroids, 1), 1))
    val a = assigned.select(col("cell").as("ca"), col("id").as("ia"),
      col("v").as("va"))
    val b = assigned.select(col("cell").as("cb"), col("id").as("ib"),
      col("v").as("vb"))
    val dropped = a.crossJoin(b)
      .filter(col("ca") === col("cb") && col("ia") < col("ib"))
      .filter(round(GraftFunctions.cosineSim(col("va"), col("vb")), 6) >= thr)
      .select("ib").distinct().collect().map(_.getLong(0)).toSet
    val expected = (1L to 40L).toSet -- dropped
    assert(kept == expected)
  }
}
