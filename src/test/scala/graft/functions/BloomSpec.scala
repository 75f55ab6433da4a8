package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val mBits = 1 << 12
  private val k = 5

  test("bloom has no false negatives: every corpus key screens as maybe_dup") {
    val corpus = (0 until 300).map(i => s"key-$i").toDF("key")
    val bloom = Dedup.bloomFilter(corpus, col("key"), mBits, k)
    val screened = Dedup.bloomScreen(corpus, bloom, col("key"), mBits, k)
    assert(screened.filter(!col("maybe_dup")).isEmpty,
      "a present key screened as definitely-absent")
  }

  test("bloom screens most absent keys out at sane sizing") {
    val corpus = (0 until 300).map(i => s"key-$i").toDF("key")
    val fresh = (1000 until 1300).map(i => s"other-$i").toDF("key")
    val bloom = Dedup.bloomFilter(corpus, col("key"), mBits, k)
    val fp = Dedup.bloomScreen(fresh, bloom, col("key"), mBits, k)
      .filter(col("maybe_dup")).count()
    // 300 keys in 4096 bits ≈ 13.7 bits/key -> fp rate well under 5%
    assert(fp < 15, s"$fp false positives out of 300 absent keys")
  }

  test("screening is deterministic and key-stable across runs") {
    val corpus = (0 until 100).map(i => s"k$i").toDF("key")
    val batch = (50 until 150).map(i => s"k$i").toDF("key")
    val bloom = Dedup.bloomFilter(corpus, col("key"), mBits, k)
    val r1 = Dedup.bloomScreen(batch, bloom, col("key"), mBits, k)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val r2 = Dedup.bloomScreen(batch, bloom, col("key"), mBits, k)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(r1 == r2)
    (50 until 100).foreach(i => assert(r1(s"k$i"), s"k$i must be maybe_dup"))
  }

  test("count-min never undercounts and is exact without collisions") {
    import graft.operators.Sketches
    // 20 keys in a 1024-cell row: collision-free with overwhelming odds,
    // so every estimate must equal the true count.
    val rows = (0 until 20).flatMap(i => Seq.fill(i + 1)(s"key-$i")).toDF("key")
    val truth = rows.groupBy("key").count().withColumnRenamed("count", "true_cnt")
    val est = Sketches.countMinEstimates(truth,
      Sketches.countMinSketch(rows, col("key"), depth = 4, width = 1024),
      col("key"), depth = 4, width = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    est.foreach { case (k, t, e) => assert(e == t, s"$k: est $e vs true $t") }
  }

  test("count-min under heavy collision still upper-bounds true counts") {
    import graft.operators.Sketches
    // 300 keys in 64 cells: every row collides; estimates may overcount
    // but can never undercount.
    val rows = (0 until 300).flatMap(i => Seq.fill(1 + i % 3)(s"u$i")).toDF("key")
    val truth = rows.groupBy("key").count().withColumnRenamed("count", "true_cnt")
    val est = Sketches.countMinEstimates(truth,
      Sketches.countMinSketch(rows, col("key"), depth = 4, width = 64),
      col("key"), depth = 4, width = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    est.foreach { case (t, e) => assert(e >= t) }
    assert(est.exists { case (t, e) => e > t },
      "with 300 keys in 64 cells some estimate must overcount")
  }

  test("bloomScreen rejects probing with a different geometry than the build") {
    val corpus = (0 until 50).map(i => s"g$i").toDF("key")
    val bloom = Dedup.bloomFilter(corpus, col("key"), mBits, k)
    val ex = intercept[IllegalArgumentException] {
      Dedup.bloomScreen(corpus, bloom, col("key"), mBits / 2, k)
    }
    assert(ex.getMessage.contains("geometry mismatch"))
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.bloomScreen(corpus, bloom, col("key"), mBits, k + 1)
    }
    assert(ex2.getMessage.contains("geometry mismatch"))
  }

  test("count-min accepts non-64-aligned widths (the e/eps sizing)") {
    import graft.operators.Sketches
    val rows = (0 until 40).map(i => s"w$i").toDF("key")
    val truth = rows.groupBy("key").count().withColumnRenamed("count", "true_cnt")
    val est = Sketches.countMinEstimates(truth,
      Sketches.countMinSketch(rows, col("key"), depth = 4, width = 272),
      col("key"), depth = 4, width = 272)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    est.foreach { case (t, e) => assert(e >= t) }
  }

  test("bloomPrefilteredJoin works with identically named join keys") {
    import graft.operators.Sketches
    val fact = (0 until 100).map(i => (i.toLong, i * 2.0)).toDF("key", "v")
    val dim = (0 until 100 by 10).map(_.toLong).toDF("key")
    val got = Sketches.bloomPrefilteredJoin(fact, dim, "key", "key",
      mBits = 1 << 12, k = 5)
      .select(fact("key")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 100L by 10).toSeq)
  }

  test("vectorAvg rejects a null vector element instead of diverging") {
    GraftFunctions.register(spark)
    val df = Seq(Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](2.0f, 3.0f))
      .toDF("vec")
    val ex = intercept[Exception] {
      df.agg(GraftFunctions.vectorAvg(col("vec"), 2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("null element")), ex.toString)
  }

  test("vectorAvg equals the explode-based mean and handles empty groups") {
    import org.apache.spark.sql.functions.{avg, posexplode}
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val df = (0 until 200).map { i =>
      (i % 3, Array.fill(8)(rnd.nextFloat()))
    }.toDF("g", "vec")
    val fast = df.groupBy("g")
      .agg(GraftFunctions.vectorAvg(col("vec"), 8).as("c"))
      .select(col("g"), posexplode(col("c")).as(Seq("d", "v")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val slow = df.select(col("g"), posexplode(col("vec")).as(Seq("d", "x")))
      .groupBy("g", "d").agg(avg(col("x").cast("double")).as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (k, v) =>
      assert(math.abs(v - slow(k)) < 1e-9, s"$k: $v vs ${slow(k)}")
    }
  }

  test("partial filters merge: union of two half-corpora equals one pass") {
    val a = (0 until 100).map(i => s"w$i").toDF("key")
    val b = (100 until 200).map(i => s"w$i").toDF("key")
    val whole = (0 until 200).map(i => s"w$i").toDF("key")
    val wordsUnion = Dedup.bloomFilter(a.union(b), col("key"), mBits, k)
      .collect().head.getSeq[Long](0)
    val wordsWhole = Dedup.bloomFilter(whole, col("key"), mBits, k)
      .collect().head.getSeq[Long](0)
    assert(wordsUnion == wordsWhole)
  }

  test("sharded routing is complete: no false negatives across any shard") {
    // every corpus key must screen maybe_dup = true through the SHARDED
    // probe — i.e. each key's probe lands on the shard its build row
    // landed on; a routing mismatch would show up as a false negative
    val corpus = (0 until 300).map(i => s"key$i").toDF("key")
    val batchPresent = (0 until 300 by 3).map(i => s"key$i").toDF("key")
    val blooms = Dedup.bloomFilterSharded(corpus, col("key"), shards = 8,
      mBits, k)
    val screened = Dedup.bloomScreenSharded(batchPresent, blooms, col("key"),
      shards = 8, mBits, k)
    assert(screened.filter(!col("maybe_dup")).count() == 0)
  }

  test("sharded screen handles empty shards as definite absence") {
    // a 2-key corpus occupies at most 2 of 8 shards; batch keys routed to
    // the empty shards must come back maybe_dup = false (not dropped, not
    // erroring on the missing filter row)
    val corpus = Seq("alpha", "beta").toDF("key")
    val batch = (0 until 64).map(i => s"probe$i").toDF("key")
    val blooms = Dedup.bloomFilterSharded(corpus, col("key"), shards = 8,
      mBits, k)
    assert(blooms.count() <= 2)
    val screened = Dedup.bloomScreenSharded(batch, blooms, col("key"),
      shards = 8, mBits, k)
    assert(screened.count() == 64, "left join must keep every batch row")
  }

  test("sharded screen of an EMPTY corpus: every key definitely absent") {
    // an empty corpus builds ZERO filter rows (groupBy, not a global agg);
    // the screen must agree with the monolithic path's semantics — nothing
    // was ever inserted, so every batch key is definitely new
    import spark.implicits._
    val corpus = spark.emptyDataset[String].toDF("key")
    val batch = (0 until 16).map(i => s"n$i").toDF("key")
    val blooms = Dedup.bloomFilterSharded(corpus, col("key"), shards = 8,
      mBits, k)
    assert(blooms.count() == 0)
    val screened = Dedup.bloomScreenSharded(batch, blooms, col("key"),
      shards = 8, mBits, k)
    assert(screened.count() == 16)
    assert(screened.filter(col("maybe_dup")).count() == 0)
    // and the full incremental dedup keeps the whole batch
    val kept = Dedup.bloomIncrementalDedupSharded(batch, corpus, col("key"),
      shards = 8, mBits, k).collect().map(_.getString(0)).sorted.toSeq
    assert(kept == (0 until 16).map(i => s"n$i").sorted)
  }

  test("sharded incremental dedup equals the monolithic exact result") {
    val corpus = (0 until 200).map(i => s"c$i").toDF("key")
    val batch = ((150 until 250).map(i => s"c$i") ++ Seq("fresh1", "fresh2"))
      .toDF("key")
    val mono = Dedup.bloomIncrementalDedup(batch, corpus, col("key"),
      mBits, k).collect().map(_.getString(0)).sorted.toSeq
    val shard = Dedup.bloomIncrementalDedupSharded(batch, corpus, col("key"),
      shards = 4, mBits, k).collect().map(_.getString(0)).sorted.toSeq
    val expected = ((200 until 250).map(i => s"c$i") ++
      Seq("fresh1", "fresh2")).sorted
    assert(mono == expected && shard == expected)
  }

  test("sharded probe rejects a shard-count mismatch loudly") {
    val corpus = (0 until 50).map(i => s"x$i").toDF("key")
    val blooms = Dedup.bloomFilterSharded(corpus, col("key"), shards = 4,
      mBits, k)
    val ex = intercept[IllegalArgumentException] {
      Dedup.bloomScreenSharded(corpus, blooms, col("key"), shards = 8,
        mBits, k)
    }
    assert(ex.getMessage.contains("geometry mismatch"))
  }
}
