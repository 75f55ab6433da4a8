package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale audit for the KMV overlap-sizing sketches (the
  * BENCH_SF10 `kmv_audit` source): prices the two ways to answer
  * "how many distinct n-grams does every source pair share" at a
  * given SF —
  *
  *  - `sketch_build`: ONE corpus scan folding each source's shingle
  *    stream into a k-minima synopsis, persisted as a parquet sketch
  *    table (O(sources·k) bytes — the artifact later questions read);
  *  - `sketch_overlap`: the full pairwise intersection matrix answered
  *    from the persisted table alone (no corpus access — the claim the
  *    operator sells: past the build, overlap questions cost sketch
  *    bytes, not scans);
  *  - `exact_overlap`: the t18-shape exact matrix (vocab distinct +
  *    tok-keyed self-join) — the cost a pipeline pays when it needs
  *    the true number, and the yardstick the sketch path is measured
  *    against at each scale;
  *  - `err`: worst |est − exact| / union over all pairs, so the audit
  *    records accuracy at scale beside the speed.
  *
  * Prints one JSON line per phase. Usage: KmvScale [sfDir] [workDir] [k]
  */
object KmvScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_kmvscale")
    val k = args.lift(2).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val G = graft.functions.GraftFunctions
    val Sk = graft.operators.Sketches

    def phase[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"kmv-scale","phase":"$label","sf_dir":"$dir","k":$k,"sec":$sec%.2f}""")
      r
    }

    val fsRoot = new org.apache.hadoop.fs.Path(work)
    fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fsRoot, true)
    val skTable = s"$work/kmv_sketches"

    val toks = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("source"),
        explode(graft.functions.TextFunctions.hashedShingleSet(
          col("text"), 3)).as("tok"))

    phase("sketch_build") {
      Sk.kmvSketches(toks, col("source"), col("tok"), k)
        .write.mode("overwrite").parquet(skTable)
    }
    val est = phase("sketch_overlap") {
      Sk.kmvOverlapMatrix(spark.read.parquet(skTable), k)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
    }
    val (exact, sizes) = phase("exact_overlap") {
      val vocab = toks.distinct().localCheckpoint()
      val sz = vocab.groupBy(col("source")).agg(count(lit(1)).as("sz"))
        .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      val ex = vocab.select(col("source").as("a"), col("tok"))
        .join(vocab.select(col("source").as("b"), col("tok")), Seq("tok"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble)
        .toMap
      (ex, sz)
    }
    var worst = 0.0
    est.foreach { case (pair, e) =>
      val ex = exact.getOrElse(pair, 0.0)
      val un = sizes(pair._1) + sizes(pair._2) - ex
      if (un > 0) worst = math.max(worst, math.abs(e - ex) / un)
    }
    println(f"""{"tool":"kmv-scale","pairs":${est.size},""" +
      f""""worst_err_over_union":$worst%.4f,""" +
      f""""sigma_term":${1.0 / (2 * math.sqrt(k.toDouble))}%.4f}""")
    spark.stop()
  }
}
