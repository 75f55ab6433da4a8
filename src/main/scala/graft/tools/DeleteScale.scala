package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale audit for index deletion/tombstones (b3c/b4c): at a
  * given SF, builds the persisted signature index, then measures the
  * incremental probe in THREE states — clean, tombstones pending (the
  * anti-join path b3c's plan shows), and post-compaction (physically
  * purged, b4c's shape) — plus the tombstone-purging compaction itself.
  * Prints one JSON line per phase for the BENCH_SF10 deletion audit.
  *
  * The numbers answer the production question the plan audit cannot:
  * what does a takedown COST at scale — how much probe overhead while
  * deletes are pending, and does the purge return the probe to its
  * clean cost. Pair-count sanity: pending == compacted (both probe the
  * retained corpus).
  *
  * Usage: DeleteScale [sfDir] [ixDir] [mode: sig|srp]
  */
object DeleteScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ix = args.lift(1).getOrElse("/tmp/graft_delscale_ix")
    val mode = args.lift(2).getOrElse("sig")
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
      println(f"""{"tool":"delete-scale","mode":"$mode","phase":"$label","sf_dir":"$dir","sec":$sec%.2f}""")
      r
    }

    val (clean, pending, purged) =
      if (mode == "srp") {
        val emb = graft.sources.Tables.table(spark, dir, "embeddings")
        val corpus = emb.filter(col("vec_id") % 5 =!= 4)
        val batch = emb.filter(col("vec_id") % 5 === 4)
        phase("build") {
          graft.operators.Dedup.writeSrpIndex(corpus, "vec_id",
            "embedding", ix, dim = 64)
        }
        def probe(): Long =
          graft.operators.Dedup.embeddingNearDupLshIncremental(batch,
            graft.operators.Dedup.readSrpIndex(spark, ix), "vec_id",
            "embedding", threshold = 0.4).count()
        val c = phase("probe_clean")(probe())
        phase("delete") {
          graft.operators.Dedup.deleteFromSrpIndex(spark, ix,
            corpus.filter(col("vec_id") % 7 === 3).select("vec_id"),
            "vec_id")
        }
        val pe = phase("probe_pending")(probe())
        phase("compact_purge") {
          graft.operators.Dedup.compactSrpIndex(spark, ix)
        }
        (c, pe, phase("probe_compacted")(probe()))
      } else if (mode == "dig") {
        // digest (exact) family: same corpus/batch/tombstone shape as
        // the signature run, probe = digestNovel count
        val docs = graft.sources.Tables.table(spark, dir, "documents")
          .withColumn("dig",
            sha2(substring(col("text"), 1, 30).cast("binary"), 256))
        val corpus = docs.filter(col("doc_id") % 5 =!= 4)
        val batch = docs.filter(col("doc_id") % 5 === 4)
        phase("build") {
          graft.operators.Dedup.writeDigestIndex(corpus, "doc_id", "dig",
            ix)
        }
        def probe(): Long =
          graft.operators.Dedup.digestNovel(batch, "doc_id", "dig",
            graft.operators.Dedup.readDigestIndex(spark, ix)).count()
        val c = phase("probe_clean")(probe())
        phase("delete") {
          graft.operators.Dedup.deleteFromDigestIndex(spark, ix,
            corpus.filter(col("doc_id") % 7 === 3).select("doc_id"),
            "doc_id")
        }
        val pe = phase("probe_pending")(probe())
        phase("compact_purge") {
          graft.operators.Dedup.compactDigestIndex(spark, ix)
        }
        (c, pe, phase("probe_compacted")(probe()))
      } else {
        val docs = graft.sources.Tables.table(spark, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 5 =!= 4)
        val batch = docs.filter(col("doc_id") % 5 === 4)
        val p = graft.operators.Dedup.MinHashParams(numHashes = 32,
          bands = 8, shingle = 3, threshold = 0.2)
        phase("build") {
          graft.operators.Dedup.writeSignatureIndex(corpus, "doc_id",
            "text", ix, p)
        }
        def probe(): Long =
          graft.operators.Dedup.minHashNearDupPairsIncremental(batch,
            graft.operators.Dedup.readSignatureIndex(spark, ix), "doc_id",
            "text", p).count()
        val c = phase("probe_clean")(probe())
        phase("delete") {
          graft.operators.Dedup.deleteFromSignatureIndex(spark, ix,
            corpus.filter(col("doc_id") % 7 === 3).select("doc_id"),
            "doc_id")
        }
        val pe = phase("probe_pending")(probe())
        phase("compact_purge") {
          graft.operators.Dedup.compactSignatureIndex(spark, ix)
        }
        (c, pe, phase("probe_compacted")(probe()))
      }
    println(s"""{"tool":"delete-scale","mode":"$mode","pairs":{"clean":$clean,"pending":$pending,"compacted":$purged},"sane":${pending == purged}}""")
    spark.stop()
  }
}
