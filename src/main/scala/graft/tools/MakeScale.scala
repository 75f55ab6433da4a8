package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale-up generator (not part of the library surface): builds
  * an sf1-equivalent dataset from the sf0.1 fixture by replicating each
  * table `factor`× with shifted keys, for scale-checkpoint benchmarks
  * (BENCH_SF1.json).
  *
  * The replication is designed to preserve WORKLOAD SHAPE, not just row
  * counts — "10× more data from the same distribution", never "10 copies
  * of every entity" (which would square the pairwise-op outputs instead
  * of scaling them linearly):
  *  - documents: every token is prefixed with a replica tag, so replicas
  *    are vocabulary-disjoint — shingle/minhash/simhash structure within
  *    a replica is preserved exactly (a consistent hash shift), and NO
  *    near-dup pairs exist across replicas;
  *  - embeddings: each replica's vectors get a replica-specific
  *    coordinate permutation — an isometry (within-replica dot products
  *    and cosines are bit-preserved) that decorrelates replicas, with
  *    labels shifted so cosine blocks stay the same SIZE (10× more
  *    blocks, not 10× bigger blocks);
  *  - facts (events, orders, lineitem, customer): entity keys shift per
  *    replica (10× users/orders/customers with the same per-entity
  *    activity); part/supplier dimensions stay shared, so join fan-in per
  *    dim key grows with SF exactly like a TPC-H fact scale-up;
  *  - region/nation/part/supplier: copied (dimension tables).
  *
  * Usage: MakeScale [srcDir] [dstDir] [factor] [onlyTables]
  * `onlyTables` (comma-separated) restricts generation — e.g.
  * `embeddings` for an ANN-only audit skips the (much heavier)
  * document/fact replication.
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1_synth")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val only = args.lift(3).map(_.split(",").map(_.trim).toSet)
    def wanted(names: String*): Boolean =
      only.forall(o => names.exists(o.contains))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def load(name: String): DataFrame =
      if (name == "events") graft.sources.Tables.events(spark, src).drop("ts_ts")
      else graft.sources.Tables.table(spark, src, name)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[make-scale] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1

    def replicate(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => tx(df, k)).reduce(_ unionByName _)

    // dimensions: shared across replicas
    if (wanted("region", "nation", "part", "supplier"))
      Seq("region", "nation", "part", "supplier")
        .filter(n => wanted(n)).foreach(n => write(load(n), n))

    if (wanted("customer", "orders", "lineitem")) {
      val cust = load("customer")
      val ords = load("orders")
      val li = load("lineitem")
      val ck = maxOf(cust, "c_custkey")
      val ok = maxOf(ords, "o_orderkey")
      write(replicate(cust)((d, k) =>
        d.withColumn("c_custkey", col("c_custkey") + lit(k * ck))), "customer")
      write(replicate(ords)((d, k) =>
        d.withColumn("o_orderkey", col("o_orderkey") + lit(k * ok))
          .withColumn("o_custkey", col("o_custkey") + lit(k * ck))), "orders")
      write(replicate(li)((d, k) =>
        d.withColumn("l_orderkey", col("l_orderkey") + lit(k * ok))), "lineitem")
    }

    if (wanted("events")) {
      val ev = load("events")
      val ek = maxOf(ev, "event_id")
      val uk = maxOf(ev, "user_id")
      write(replicate(ev)((d, k) =>
        d.withColumn("event_id", col("event_id") + lit(k * ek))
          .withColumn("user_id", col("user_id") + lit(k * uk))), "events")
    }

    if (wanted("documents")) {
      val docs = load("documents")
      val dk = maxOf(docs, "doc_id")
      write(replicate(docs) { (d, k) =>
        if (k == 0) d
        else {
          // replica-tagged vocabulary: same within-replica dup structure,
          // zero cross-replica shingle overlap
          val tagged = array_join(
            transform(split(col("text"), " "), w => concat(lit(s"r$k"), w)), " ")
          d.withColumn("doc_id", col("doc_id") + lit(k * dk))
            .withColumn("text", tagged)
            .withColumn("n_chars", length(tagged))
        }
      }, "documents")
    }

    if (!wanted("embeddings")) { spark.stop(); return }
    val emb = load("embeddings")
    val vk = maxOf(emb, "vec_id")
    val dim = 64
    // Rotation 7k mod 64 repeats every 64 replicas (7 is invertible mod
    // 64, so k and k+64 get the SAME permutation of the SAME base
    // vectors — bit-identical replicas, i.e. a flood of spurious exact
    // near-dup pairs). Compose a second isometry for the second block of
    // 64: global negation (preserves every within-replica dot product,
    // sends the colliding pair to cosine −1). Unique through factor 128.
    require(factor <= 128,
      s"embedding replication supports factor <= 128 (got $factor): " +
        "rotation x negation runs out of distinct isometries")
    write(replicate(emb) { (d, k) =>
      if (k == 0) d
      else {
        // coordinate rotation by 7k (coprime-ish with 64 for k not a
        // multiple of 64/gcd): an isometry within the replica,
        // decorrelating across replicas
        val perm = transform(sequence(lit(0), lit(dim - 1)),
          i => element_at(col("embedding"), pmod(i + lit(7 * k), lit(dim)) + 1))
        val iso = if (k < 64) perm else transform(perm, x => -x)
        d.withColumn("vec_id", col("vec_id") + lit(k.toLong * vk))
          .withColumn("embedding", iso.cast("array<float>"))
          .withColumn("label", col("label") + lit(k * 1000))
      }
    }, "embeddings")

    spark.stop()
  }
}
