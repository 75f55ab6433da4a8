package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.AnnModels
import graft.sources.Tables

/** Persisted IVF cell-partitioned layout (`Similarity.writeIvfLayout` /
  * `ivfTopKIndexed`): the probe must (a) reproduce the live `ivfTopK`
  * bit-for-bit, (b) read ONLY the probed cell directories — the cell
  * IN-set must reach the scan as PartitionFilters, and (c) run under the
  * layout's own persisted quantizer (self-describing, like the MinHash /
  * SRP index params contract).
  */
class IvfLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf001

  test("indexed probe is bit-identical to the live ivfTopK") {
    val emb = Tables.embeddings(spark, dir)
    val base = Files.createTempDirectory("graft-ivf-layout").toString
    Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
      AnnModels.ivfCentroids)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val live = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      "qid", "qvec", k = 5, AnnModels.ivfCentroids, nprobe = 8)
      .collect().map(_.toSeq).toSet
    val indexed = Similarity.ivfTopKIndexed(spark, base, queries,
      "qid", "qvec", k = 5, nprobe = 8)
      .collect().map(_.toSeq).toSet
    assert(indexed == live)
    assert(indexed.nonEmpty)
  }

  test("probe scan is partition-pruned to the probed cells") {
    val emb = Tables.embeddings(spark, dir)
    val base = Files.createTempDirectory("graft-ivf-prune").toString
    Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
      AnnModels.ivfCentroids)
    // layout sanity: hive-style cell=K/ directories, cell not in the files
    val cellDirs = new java.io.File(s"$base/cells").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.length > 1)
    // nprobe=1, one query -> exactly one cell may be read
    val one = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probed = Similarity.ivfTopKIndexed(spark, base, one,
      "qid", "qvec", k = 3, nprobe = 1, excludeSelf = true)
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
    // the filter names EXACTLY the one probed cell (the query's nearest
    // centroid), so every other cell=K/ directory is pruned from the
    // file listing at the storage layer
    val expectedCell = {
      graft.functions.GraftFunctions.register(spark)
      one.select(element_at(graft.functions.GraftFunctions
        .ivfProbes(col("qvec"), AnnModels.ivfCentroids, 1), 1))
        .collect().head.getInt(0)
    }
    // the non-partitioned query-side scan prints an empty
    // PartitionFilters line too — find the segment naming the cell
    val segs = scan.split("PartitionFilters: \\[").drop(1)
      .map(_.takeWhile(_ != ']'))
    assert(segs.exists(s =>
      s.contains("cell") && s.contains(expectedCell.toString)))
  }

  test("probe runs under the layout's own persisted quantizer") {
    // a 2-cell toy layout written with hand-picked centroids: the probe
    // gets NO centroids argument and must recover cell routing from the
    // params table
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0f, 1f)), (4L, Seq(0.1f, 0.9f))
    ).toDF("id", "v")
    val cents: Seq[Seq[Float]] = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val base = Files.createTempDirectory("graft-ivf-params").toString
    Similarity.writeIvfLayout(corpus, base, "id", "v", cents)
    val q = Seq((100L, Seq(0.95f, 0.05f))).toDF("qid", "qv")
    val got = Similarity.ivfTopKIndexed(spark, base, q, "qid", "qv",
      k = 2, nprobe = 1)
      .select(col("id")).as[Long].collect().toSet
    // nprobe=1 routes the query to cell 0 -> only ids 1,2 are reachable
    assert(got == Set(1L, 2L))
  }

  test("PQ-coded layout: indexed ADC+rerank is bit-identical to live ivfPqTopK") {
    val emb = Tables.embeddings(spark, dir)
    val base = Files.createTempDirectory("graft-ivfpq-layout").toString
    Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
      AnnModels.ivfCentroids, AnnModels.pqCodebooks,
      pqM = AnnModels.pqM, pqK = AnnModels.pqK)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val live = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      "qid", "qvec", topK = 5, AnnModels.ivfCentroids, nprobe = 8,
      AnnModels.pqCodebooks, m = AnnModels.pqM, k = AnnModels.pqK,
      rerank = 50)
      .collect().map(_.toSeq).toSet
    val indexed = Similarity.ivfPqTopKIndexed(spark, base, queries,
      "qid", "qvec", topK = 5, nprobe = 8, rerank = 50)
      .collect().map(_.toSeq).toSet
    assert(indexed == live)
    assert(indexed.nonEmpty)
  }

  test("PQ probe's ADC scan reads codes, not the float vectors") {
    val emb = Tables.embeddings(spark, dir)
    val base = Files.createTempDirectory("graft-ivfpq-prune").toString
    Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
      AnnModels.ivfCentroids, AnnModels.pqCodebooks,
      pqM = AnnModels.pqM, pqK = AnnModels.pqK)
    val one = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // rerank <= topK: the plan is the pure ADC path — its ONLY layout
    // scan must project (vec_id, codes) and leave `embedding` unread
    val adcOnly = Similarity.ivfPqTopKIndexed(spark, base, one,
      "qid", "qvec", topK = 3, nprobe = 2, rerank = 0)
    val scans = adcOnly.queryExecution.executedPlan.toString
      .split("ReadSchema: ").drop(1).map(_.takeWhile(_ != '\n'))
      .filter(_.contains("codes"))
    assert(scans.nonEmpty)
    assert(scans.forall(!_.contains("embedding")))
    assert(adcOnly.collect().nonEmpty)
  }

  test("PQ probe on a codes-less layout fails loudly") {
    val emb = Tables.embeddings(spark, dir).limit(50)
    val base = Files.createTempDirectory("graft-ivfpq-nocodes").toString
    Similarity.writeIvfLayout(emb, base, "vec_id", "embedding",
      AnnModels.ivfCentroids)
    val q = emb.limit(1)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexed(spark, base, q, "qid", "qvec", topK = 1)
    }
    assert(e.getMessage.contains("PQ"))
  }

  test("ivfCellsFor follows the 4·sqrt(n) law and clamps") {
    assert(Similarity.ivfCellsFor(1) == 8)          // min clamp
    assert(Similarity.ivfCellsFor(2000) == 179)     // ceil(4*44.72)
    assert(Similarity.ivfCellsFor(200000) == 1789)  // ceil(4*447.2)
    assert(Similarity.ivfCellsFor(10000000000L) == 4096) // max clamp
    // monotone across decades; occupancy sqrt-scaling: 100x rows -> ~10x
    // per-cell occupancy at the law's cells
    val occ01 = 2000.0 / Similarity.ivfCellsFor(2000)
    val occ10 = 200000.0 / Similarity.ivfCellsFor(200000)
    assert(occ10 / occ01 > 8 && occ10 / occ01 < 12)
  }

  test("writeIvfLayoutAuto sizes the quantizer from the corpus; probe equals live path") {
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val base = Files.createTempDirectory("graft-ivf-auto").toString
    val cents = Similarity.writeIvfLayoutAuto(emb, base, "vec_id", "embedding")
    assert(cents.length == Similarity.ivfCellsFor(n))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val live = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      "qid", "qvec", k = 3, cents, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val indexed = Similarity.ivfTopKIndexed(spark, base, queries,
      "qid", "qvec", k = 3, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(indexed == live)
    assert(indexed.nonEmpty)
  }

  test("writeIvfLayoutAuto clamps cells to a tiny corpus instead of " +
      "failing inside trainCentroids") {
    val tiny = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val base = Files.createTempDirectory("graft-ivf-tiny").toString
    val cents = Similarity.writeIvfLayoutAuto(tiny, base,
      "vec_id", "embedding")
    assert(cents.length <= 3 && cents.nonEmpty)
    val q = Seq((1L, Seq(1f, 0f))).toDF("qid", "qvec")
    val got = Similarity.ivfTopKIndexed(spark, base, q, "qid", "qvec",
      k = 1, nprobe = cents.length, excludeSelf = false)
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("vec_id") == 1L)
  }

  test("auto-sized layout recall >= 0.5 vs exact brute force on sf0.01 embeddings") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val base = Files.createTempDirectory("graft-ivf-auto-recall").toString
    Similarity.writeIvfLayoutAuto(emb, base, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
      "embedding", "qid", "qvec", k = 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopKIndexed(spark, base, queries,
      "qid", "qvec", k = 5, nprobe = 8)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 50)
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"auto IVF layout recall vs exact top-5: $recall%.2f " +
      f"(${approx.size} returned)")
    assert(recall >= 0.5, f"recall $recall%.2f < 0.5")
  }

  test("probing a path without a params table fails loudly") {
    val base = Files.createTempDirectory("graft-ivf-noparams").toString
    val q = Seq((1L, Seq(1f, 0f))).toDF("qid", "qv")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKIndexed(spark, base, q, "qid", "qv", k = 1)
    }
    assert(e.getMessage.contains("params"))
  }
}
