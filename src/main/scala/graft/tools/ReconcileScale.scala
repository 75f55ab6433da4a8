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
  * The digest family ("digest" as the third arg) audits the same
  * deployment shape under the governed EXACT-dedup loop: the measured
  * pass is then ONE digest-keyed shuffle of the union's (id, dig)
  * rows (the equi-join star — map-side partial counts, one row per
  * distinct digest on the wire) plus the same O(drops) takedown work.
  *
  * Prints one JSON line per phase.
  * Usage: ReconcileScale [sfDir] [work] [minhash|digest|srp]
  */
object ReconcileScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_reconscale")
    val family = args.lift(2).getOrElse("minhash")
    require(Set("minhash", "digest", "srp")(family),
      s"unknown family $family")
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
      println(f"""{"tool":"reconcile-scale","family":"$family","phase":"$label","sf_dir":"$dir","sec":$sec%.2f}""")
      r
    }

    val Dd = graft.operators.Dedup
    val fsRoot = new org.apache.hadoop.fs.Path(work)
    fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fsRoot, true)
    if (family == "srp") {
      // p6's deployment shape sharded even/odd, with the audit's own
      // operating point: threshold 0.6 keeps the in-shard screens
      // selective at ANY corpus density (the corpus-analysis 0.4 of
      // d5/p6 saturates at 100x — in a 100x-denser 64-dim corpus
      // nearly every vector has SOME 0.4-cosine neighbor, so the
      // governed loops would serve almost nothing and the reconcile
      // pass would sweep an empty union). Cross-shard duplicates are
      // PLANTED deterministically (1% of batch vectors copied verbatim
      // under a parity-flipping id offset — cosine 1.0, so they
      // survive any threshold and each shard's own screen provably
      // cannot see its twin); the drop count then grows with the
      // corpus, like the other two family audits.
      val base0 = graft.sources.Tables.table(spark, dir, "embeddings")
      val maxId = base0.agg(max(col("vec_id"))).head().getLong(0)
      val ec1 = maxId * 3 / 5
      val offset = if ((maxId + 1) % 2 == 1) maxId + 1 else maxId + 2
      val planted = base0
        .filter(col("vec_id") > ec1 && col("vec_id") % 100 === 0)
        .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
      val emb = base0.select("vec_id", "embedding").unionByName(planted)
      val sh = phase("build_shards") {
        Dd.buildTwoShardSrpDeployment(emb, "vec_id", "embedding", ec1,
          dim = 64, threshold = 0.6, base = work)
      }
      val st = phase("reconcile") {
        Dd.reconcileShardOutputsSrp(spark, sh, "vec_id", "embedding",
          threshold = 0.6)
      }
      println(s"""{"tool":"reconcile-scale","family":"srp","info":"pass1","cross_pairs":${st.crossPairs},"dropped":${st.dropped},"scrubbed":${st.scrubbedRows}}""")
      val st2 = phase("reconcile_noop") {
        Dd.reconcileShardOutputsSrp(spark, sh, "vec_id", "embedding",
          threshold = 0.6)
      }
      println(s"""{"tool":"reconcile-scale","family":"srp","info":"pass2","cross_pairs":${st2.crossPairs},"dropped":${st2.dropped}}""")
      spark.stop()
      return
    }
    val raw = graft.sources.Tables.table(spark, dir, "documents")
    val maxId = raw.agg(max(col("doc_id"))).head().getLong(0)
    val c1 = maxId * 3 / 5
    val (shards, reconcile) =
      if (family == "digest") {
        // the p10 recipe: sha-256 of the text prefix as the exact key
        val docs = raw.withColumn("dig",
            sha2(substring(col("text"), 1, 30).cast("binary"), 256))
          .select("doc_id", "dig")
        val sh = phase("build_shards") {
          Dd.buildTwoShardDigestDeployment(docs, "doc_id", "dig", c1, work)
        }
        (sh, () => Dd.reconcileShardOutputsDigest(spark, sh, "doc_id", "dig"))
      } else {
        val docs = raw.select("doc_id", "text")
        val p = Dd.MinHashParams(numHashes = 32, bands = 8, shingle = 3,
          threshold = 0.2)
        val sh = phase("build_shards") {
          Dd.buildTwoShardDeployment(docs, "doc_id", "text", c1, p, work)
        }
        (sh, () => Dd.reconcileShardOutputs(spark, sh, "doc_id", "text"))
      }
    val st = phase("reconcile") { reconcile() }
    println(s"""{"tool":"reconcile-scale","family":"$family","info":"pass1","cross_pairs":${st.crossPairs},"dropped":${st.dropped},"scrubbed":${st.scrubbedRows}}""")
    val st2 = phase("reconcile_noop") { reconcile() }
    println(s"""{"tool":"reconcile-scale","family":"$family","info":"pass2","cross_pairs":${st2.crossPairs},"dropped":${st2.dropped}}""")
    spark.stop()
  }
}
