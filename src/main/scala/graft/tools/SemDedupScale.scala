package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale audit for SemDeDup (d11): times `Dedup.semDeDup` at a
  * given SF under TWO quantizer sizings and prints one JSON line per
  * run, for the BENCH_SF10 decade notes.
  *
  *  - `frozen`: the sf0.1-trained 32-cell artifact the d11 bench entry
  *    uses (`AnnModels.ivfCentroids`). At 100× data this is the WRONG
  *    production sizing — cell occupancy grows 100×, so within-cell
  *    pair work (Σ cell²) grows ~100× per cell — and the audit exists
  *    to measure exactly that failure shape, like d5b/d5c do for
  *    fixed-plane SRP.
  *  - `scaled`: cells ∝ corpus at ~constant target occupancy (the
  *    SemDeDup paper's sizing — clusters grow with the corpus), trained
  *    on the corpus itself by the same deterministic
  *    [[graft.operators.Similarity.trainCentroids]]. This is the
  *    production path whose decade ratio should stay ~linear.
  *
  * Usage: SemDedupScale [sfDir] [targetCellOccupancy=64]
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val targetOcc = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val emb = graft.sources.Tables.table(spark, dir, "embeddings")
    val n = emb.count()

    def timeKept(label: String, centroids: Seq[Seq[Float]]): Unit = {
      val t0 = System.nanoTime()
      val kept = graft.operators.Dedup
        .semDeDup(emb, "vec_id", "embedding", centroids, threshold = 0.4)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"semdedup-scale","variant":"$label","sf_dir":"$dir","n":$n,"cells":${centroids.length},"kept":$kept,"sec":$sec%.2f}""")
    }

    // frozen sf0.1 artifact — the d11 bench entry's quantizer
    timeKept("frozen32", graft.functions.AnnModels.ivfCentroids)

    // production sizing via the library's own law; train on the corpus
    // with a sample bound that keeps the driver k-means tractable
    val cells = graft.operators.Dedup.semDedupCellsFor(n, targetOcc,
      maxCells = 8192)
    val tTrain = System.nanoTime()
    val cents = graft.operators.Similarity.trainCentroids(
      emb, "vec_id", "embedding", c = cells, iters = 3,
      maxTrain = math.max(cells * 4, 10000))
    println(f"""{"tool":"semdedup-scale","variant":"train","cells":$cells,"sec":${(System.nanoTime() - tTrain) / 1e9}%.2f}""")
    timeKept(s"scaled", cents)

    spark.stop()
  }
}
