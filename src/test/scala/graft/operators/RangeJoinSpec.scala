package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoin matches same-key rows inside the half-open window") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 100L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, 1.0), (1L, 109L, 2.0), (1L, 110L, 3.0),
      (1L, 205L, 4.0), (2L, 50L, 5.0)).toDF("rk", "rts", "v")
    val out = RangeJoin.intervalJoin(left, right, "k", "rk", "ts", "rts",
      0L, 10L)
      .select(col("tag"), col("v")).orderBy(col("tag"), col("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // window [ts, ts+10): 100 and 109 match anchor a; 110 excluded
    // (half-open); 205 matches anchor b; key 2 has no row in [100, 110)
    assert(out == Seq(("a", 1.0), ("a", 2.0), ("b", 4.0)))
  }

  test("intervalJoin with negative lower bound looks backwards") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 95L, "in"), (1L, 89L, "out"), (1L, 100L, "edge"))
      .toDF("rk", "rts", "tag")
    val out = RangeJoin.intervalJoin(left, right, "k", "rk", "ts", "rts",
      -10L, 1L)
      .select(col("tag")).orderBy(col("tag"))
      .collect().map(_.getString(0)).toSeq
    // [90, 101): 95 and 100 in, 89 out
    assert(out == Seq("edge", "in"))
  }

  test("intervalJoin equals a naive filter of the cross product on random data") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 50).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = (0 until 80).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("rk", "rts", "rid")
    val got = RangeJoin.intervalJoin(left, right, "k", "rk", "ts", "rts",
      -25L, 50L)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = left.crossJoin(right)
      .filter(col("k") === col("rk") &&
        col("rts") >= col("ts") - 25L && col("rts") < col("ts") + 50L)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("intervalJoin plans as an equi-join on the key, not a nested loop") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 100L)).toDF("rk", "rts")
    val plan = RangeJoin.intervalJoin(left, right, "k", "rk", "ts", "rts",
      0L, 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

class StratifiedSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0 until 2000).map(i =>
    (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "zh"))
    .toDF("doc_id", "lang")

  test("stratified sample rates track the per-stratum fractions") {
    val out = Sampling.stratifiedSampleByHash(docs, "doc_id", "lang",
      Map("en" -> 0.5, "fr" -> 0.1), 0.02)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~667 docs per stratum; hash buckets are near-uniform
    assert(out("en") > 230 && out("en") < 430, out)
    assert(out("fr") > 25 && out("fr") < 110, out)
    assert(out.getOrElse("zh", 0L) < 40, out)
  }

  test("stratified sample is a subset decided per key (stable + consistent)") {
    val kept = Sampling.stratifiedSampleByHash(docs, "doc_id", "lang",
      Map("en" -> 0.5), 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val keptAgain = Sampling.stratifiedSampleByHash(docs, "doc_id", "lang",
      Map("en" -> 0.5), 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == keptAgain)
    // raising a stratum's fraction only ADDs rows of that stratum
    val wider = Sampling.stratifiedSampleByHash(docs, "doc_id", "lang",
      Map("en" -> 0.8), 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(wider))
  }
}

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: repeated text shows high dup_frac, varied text low") {
    val varied = (1 to 30).map("w" + _).mkString(" ")       // all distinct
    val looped = Seq.fill(10)("spam ham eggs").mkString(" ") // 30 tokens, 3-periodic
    val tiny = "just two"
    val df = Seq((0L, varied), (1L, looped), (2L, tiny)).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) == ((28L, 28L, 0.0)))
    // 28 trigram occurrences but only 3 distinct rotations of the loop
    assert(out(1L)._1 == 28L && out(1L)._2 == 3L)
    assert(out(1L)._3 > 0.85)
    // < n tokens: no n-grams, dup_frac 0 (not an error, not null)
    assert(out(2L) == ((0L, 0L, 0.0)))
  }
}
