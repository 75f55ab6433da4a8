package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Deterministic training-shard writer (`Sampling.writeTrainingShards`):
  * the shuffle must be a pure key function (identical across runs),
  * content-complete, FILE-ordered by the stored `ord` key, and a salt
  * change must be a genuinely different permutation.
  */
class ShardWriterSpec extends SparkSpec {
  import spark.implicits._

  private def rmrf(d: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete()
    }
    rec(new java.io.File(d))
  }

  private def docs = Tables.documents(spark, sf001)
    .select(col("doc_id"), col("lang"))

  test("shards are content-complete and deterministic across runs") {
    val base = Files.createTempDirectory("graft-shards").toString
    try {
      Sampling.writeTrainingShards(docs, s"$base/a", "doc_id", 8, "s")
      Sampling.writeTrainingShards(docs, s"$base/b", "doc_id", 8, "s")
      val a = spark.read.parquet(s"$base/a")
        .select("doc_id", "lang", "shard", "ord")
        .collect().map(_.toSeq).toSet
      val b = spark.read.parquet(s"$base/b")
        .select("doc_id", "lang", "shard", "ord")
        .collect().map(_.toSeq).toSet
      assert(a == b)
      // content-complete: every input row appears exactly once
      val in = docs.collect().map(_.toSeq).toSet
      assert(a.map(r => Seq(r(0), r(1))) == in)
      assert(a.size == in.size)
      // all shard ids in range; more than one shard actually used
      val ids = a.map(_(2).asInstanceOf[Int])
      assert(ids.forall(s => s >= 0 && s < 8) && ids.size > 1)
    } finally rmrf(base)
  }

  test("each shard is ONE file whose physical row order is the ord key") {
    val base = Files.createTempDirectory("graft-shards-ord").toString
    try {
      Sampling.writeTrainingShards(docs, base, "doc_id", 4, "ord-spec")
      val shardDirs = new java.io.File(base).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("shard="))
      assert(shardDirs.length == 4)
      shardDirs.foreach { d =>
        val files = d.listFiles().filter(f =>
          f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        assert(files.length == 1, s"${d.getName}: ${files.length} files")
        // a single parquet file read by a single task preserves row
        // order — the dataloader's view of the shard
        val ords = spark.read.parquet(files.head.getPath)
          .select("ord").collect().map(_.getLong(0)).toSeq
        assert(ords == ords.sorted, s"${d.getName} not in ord order")
        assert(ords.nonEmpty)
      }
    } finally rmrf(base)
  }

  test("a different salt is a different permutation; same content") {
    val base = Files.createTempDirectory("graft-shards-salt").toString
    try {
      Sampling.writeTrainingShards(docs, s"$base/a", "doc_id", 8, "epoch0")
      Sampling.writeTrainingShards(docs, s"$base/b", "doc_id", 8, "epoch1")
      val a = spark.read.parquet(s"$base/a")
        .select("doc_id", "shard", "ord").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      val b = spark.read.parquet(s"$base/b")
        .select("doc_id", "shard", "ord").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      assert(a.keySet == b.keySet)
      assert(a.exists { case (k, v) => b(k) != v })
    } finally rmrf(base)
  }
}
