package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale audit for cross-shard duplicate reconciliation
  * (BENCH_SF10 `reconcile_audit`): at a given SF, stands up the
  * two-shard governed MinHash deployment (even/odd doc_id router),
  * ingests one governed batch per shard, then measures the reconcile
  * pass itself — the claim under test is that a reconcile costs ONE
  * union-wide LSH sweep of the served corpora (the d2 plan family,
  * linear-with-log-fan in the union) plus O(cross-shard duplicates)
  * takedown work, never all-pairs and never a per-shard rescan.
  *
  *  - `build_shards`: both indexes + ledgers + one governed batch each
  *    (setup, not the claim — the same phases maintenance_audit prices).
  *  - `reconcile`: the measured pass over the two served corpora.
  *  - `reconcile_noop`: the second pass — the steady state when no new
  *    cross-shard duplication accrued; prices the fixed floor.
  *
  * Prints one JSON line per phase. Usage: ReconcileScale [sfDir] [work]
  */
object ReconcileScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_reconscale")
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
      println(f"""{"tool":"reconcile-scale","phase":"$label","sf_dir":"$dir","sec":$sec%.2f}""")
      r
    }

    val Dd = graft.operators.Dedup
    val fsRoot = new org.apache.hadoop.fs.Path(work)
    fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fsRoot, true)
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select("doc_id", "text")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val c1 = maxId * 3 / 5
    val p = Dd.MinHashParams(numHashes = 32, bands = 8, shingle = 3,
      threshold = 0.2)
    val shards = phase("build_shards") {
      Dd.buildTwoShardDeployment(docs, "doc_id", "text", c1, p, work)
    }
    val st = phase("reconcile") {
      Dd.reconcileShardOutputs(spark, shards, "doc_id", "text")
    }
    println(s"""{"tool":"reconcile-scale","info":"pass1","cross_pairs":${st.crossPairs},"dropped":${st.dropped},"scrubbed":${st.scrubbedRows}}""")
    val st2 = phase("reconcile_noop") {
      Dd.reconcileShardOutputs(spark, shards, "doc_id", "text")
    }
    println(s"""{"tool":"reconcile-scale","info":"pass2","cross_pairs":${st2.crossPairs},"dropped":${st2.dropped}}""")
    spark.stop()
  }
}
