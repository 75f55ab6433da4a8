package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions, TextFunctions}

/** DSIR importance resampling (Sampling.dsirFit / dsirScored /
  * dsirResample): kernel-vs-naive score parity, target alignment, and
  * the determinism/selection contracts.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // "target-like" docs: heavy in the cat/dog vocabulary
    (1L, "en", "the cat sat on the mat with the dog"),
    (2L, "en", "a dog and a cat play on the mat"),
    (3L, "en", "the cat and the dog sat by the door"),
    (4L, "de", "der hund und die katze sitzen am tor"),
    (5L, "de", "die katze spielt mit dem hund am tor"),
    // mixed doc sharing target vocabulary
    (6L, "de", "the cat sat am tor with the dog"),
    // short/degenerate docs
    (7L, "en", "cat"),
    (8L, "de", "")
  ).toDF("doc_id", "lang", "text")

  test("dsirScored equals the naive explode-join formulation") {
    val model = Sampling.dsirFit(docs, "text", col("lang") === "en",
      buckets = 64)
    val scored = Sampling.dsirScored(docs, "text", model)
      .select("doc_id", "dsir_score")

    // naive: explode features, join bucket -> log-ratio, sum per doc.
    // (Summation ORDER differs from the kernel's in-order loop, so
    // compare at 1e-9 — the oracle twin, which must be bit-identical,
    // replays the kernel's order instead.)
    val lr = model.logRatios.zipWithIndex.map { case (v, b) => (b, v) }
      .toSeq.toDF("b", "lr")
    val naive = docs
      .select(col("doc_id"),
        explode(concat(TextFunctions.tokenHashes(col("text")),
          TextFunctions.windowHashes(col("text"), 2))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(64L)).as("b"))
      .join(lr, "b")
      .groupBy("doc_id").agg(sum(col("lr")).as("naive_score"))

    val joined = scored.join(naive, Seq("doc_id"), "left").collect()
    assert(joined.length == docs.count())
    joined.foreach { r =>
      val naiveScore = if (r.isNullAt(2)) 0.0 else r.getDouble(2)
      assert(math.abs(r.getDouble(1) - naiveScore) < 1e-6,
        s"doc ${r.getLong(0)}: kernel ${r.getDouble(1)} vs naive $naiveScore")
    }
  }

  test("target-like documents score higher than off-target ones") {
    val model = Sampling.dsirFit(docs, "text", col("lang") === "en",
      buckets = 256)
    val byId = Sampling.dsirScored(docs, "text", model)
      .select("doc_id", "dsir_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val target = Seq(1L, 2L, 3L).map(byId)
    val off = Seq(4L, 5L).map(byId)
    assert(target.min > off.max,
      s"target docs $target should outscore off-target $off")
    // the mixed doc lands between the pure groups
    assert(byId(6L) > off.max && byId(6L) < target.max)
  }

  test("empty and single-token docs score without error") {
    val model = Sampling.dsirFit(docs, "text", col("lang") === "en",
      buckets = 64)
    val byId = Sampling.dsirScored(docs, "text", model)
      .select("doc_id", "dsir_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 8 ("") still has one (empty-string) token feature; finite score
    assert(byId.contains(7L) && byId.contains(8L))
    assert(!byId(7L).isNaN && !byId(8L).isNaN)
  }

  test("dsirResample is deterministic, size-k, and selects by key") {
    val a = Sampling.dsirResample(docs, "doc_id", "text",
      col("lang") === "en", k = 4, buckets = 64)
      .select("doc_id", "dsir_key").collect()
    val b = Sampling.dsirResample(docs, "doc_id", "text",
      col("lang") === "en", k = 4, buckets = 64)
      .select("doc_id", "dsir_key").collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    assert(a.length == 4)
    // selected keys dominate every unselected key
    val all = Sampling.dsirResample(docs, "doc_id", "text",
      col("lang") === "en", k = 8, buckets = 64)
      .select("doc_id", "dsir_key").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val selected = a.map(_.getLong(0)).toSet
    val minSel = a.map(_.getDouble(1)).min
    all.filterNot(kv => selected(kv._1)).values.foreach(v =>
      assert(v <= minSel))
  }

  test("model log-ratios are 9-dp rounded and bounded by the smoothing") {
    val model = Sampling.dsirFit(docs, "text", col("lang") === "en",
      buckets = 32)
    assert(model.logRatios.length == 32)
    model.logRatios.foreach { v =>
      assert(math.abs(v * 1e9 - math.rint(v * 1e9)) < 1e-3,
        s"log-ratio $v not 9-dp rounded")
      // Laplace smoothing bounds: |lr| <= ln(max(count)+1) + ln-ratio of
      // totals — loose sanity bound for this corpus
      assert(math.abs(v) < 10.0)
    }
  }
}
