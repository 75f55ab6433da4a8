package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, TextOps}

/** [[NfcNormalize]] / [[TextOps.normalizeText]]: canonical-equivalent
  * encodings must collide after normalization — and genuinely distinct
  * strings must not — both at the string level and through the
  * shingle-based dedup family the operator exists to feed.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café résumé naïve"
  // built programmatically - source files are typically NFC, so a
  // literal could never reliably be the decomposed form
  private val decomposed = java.text.Normalizer.normalize(composed,
    java.text.Normalizer.Form.NFD)

  test("NFC normalization composes canonical equivalents; ASCII and " +
      "already-NFC strings pass through identical") {
    GraftFunctions.register(spark)
    assert(composed != decomposed, "NFD fixture must differ byte-wise")
    val df = Seq(
      (1L, composed), (2L, decomposed),
      (3L, "plain ascii text"), (4L, "different text entirely"))
      .toDF("id", "s")
      .withColumn("norm", TextOps.normalizeText(col("s")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(df(1L) == composed, "already-NFC input must be unchanged")
    assert(df(2L) == composed, "NFD input must compose to the NFC form")
    assert(df(3L) == "plain ascii text")
    assert(df(4L) != df(3L), "distinct strings stay distinct")
  }

  test("case-fold and whitespace collapse compose on top of NFC") {
    GraftFunctions.register(spark)
    val out = Seq((1L, "  CAFÉ   Mixed \t Spaces  "))
      .toDF("id", "s")
      .withColumn("norm", TextOps.normalizeText(col("s"),
        caseFold = true, collapseWhitespace = true))
      .collect().head.getString(2)
    assert(out == "café mixed spaces", s"got '$out'")
  }

  test("null and empty input behave like the rest of the string family") {
    GraftFunctions.register(spark)
    val out = Seq((1L, null: String), (2L, ""))
      .toDF("id", "s")
      .withColumn("norm", TextOps.normalizeText(col("s")))
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(1L).isEmpty && out(2L).contains(""))
  }

  test("normalize is persisted index geometry: a normalized index " +
      "matches NFD probes, and a mismatched probe fails loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft-norm-ix")
      .toString
    val ix = s"$base/ix"
    try {
      val text = "alpha bravo charlie delta echo foxtrot golf hotel " +
        "café résumé naïve india juliet kilo lima"
      val corpus = Seq((1L, text)).toDF("doc_id", "text")
      val batch = Seq((10L, java.text.Normalizer.normalize(text,
        java.text.Normalizer.Form.NFD))).toDF("doc_id", "text")
      val p = Dedup.MinHashParams(numHashes = 32, bands = 8, shingle = 3,
        threshold = 0.9, normalize = true)
      Dedup.writeSignatureIndex(corpus, "doc_id", "text", ix, p)
      val pairs = Dedup.minHashNearDupPairsIncremental(batch,
        Dedup.readSignatureIndex(spark, ix), "doc_id", "text", p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.toSeq == Seq((10L, 1L, 1.0)),
        s"NFD batch must collide with the normalized index: ${pairs.toSeq}")
      // read-back carries the flag; a mismatched probe is unrepresentable
      assert(Dedup.readSignatureIndex(spark, ix).params.normalize)
      val e = intercept[IllegalArgumentException] {
        Dedup.minHashNearDupPairsIncremental(batch,
          Dedup.readSignatureIndex(spark, ix), "doc_id", "text",
          p.copy(normalize = false))
      }
      assert(e.getMessage.contains("normalize"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(base)).deleteRecursively()
    }
  }

  test("an NFD copy collides with its NFC original in MinHash dedup " +
      "after normalizeText, and not before") {
    val doc = "alpha bravo charlie delta echo foxtrot golf hotel " +
      s"café résumé naïve india juliet kilo lima"
    val docNfd = java.text.Normalizer.normalize(doc,
      java.text.Normalizer.Form.NFD)
    assert(doc != docNfd, "fixture must actually differ byte-wise")
    val df = Seq((1L, doc), (2L, docNfd)).toDF("doc_id", "text")
    val p = Dedup.MinHashParams(numHashes = 32, bands = 8, shingle = 3,
      threshold = 0.9)
    val raw = Dedup.minHashNearDupPairs(df, "doc_id", "text", p).count()
    assert(raw == 0L,
      "without normalization the NFD copy must NOT collide (that is the " +
        "gap normalizeText closes)")
    val norm = df.withColumn("text", TextOps.normalizeText(col("text")))
    val pairs = Dedup.minHashNearDupPairs(norm, "doc_id", "text", p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)),
      s"normalized variants must collide at jaccard 1.0: ${pairs.toSeq}")
  }
}
