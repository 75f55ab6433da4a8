package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multimodal-column plumbing (north-star tier, SURVEY.md §2.3): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction as distributed
  * per-partition batch jobs.
  *
  * STUB NOTICE: this container has no image/audio codecs, so the *decode
  * math* is a clearly-marked deterministic fake ([[StubDecoder]]). The
  * Spark-side plumbing is real and is what matters at 100 TB: binary
  * columns ride through parquet scans untouched (no row-level decode in
  * Catalyst), metadata extraction is a codegen'd projection, and heavy
  * decoding runs via `mapPartitions` so per-partition setup (a real codec
  * would open a decoder context once per partition, not per row) is
  * amortized — the Scala analog of a Pandas-UDF `mapInPandas` batch.
  */
object Multimodal {

  /** Typed row for the decoded-feature Dataset path. */
  final case class MediaFeature(doc_id: Long, media_type: String,
                                n_bytes: Int, checksum: Long,
                                feature: Array[Double])

  /** Attach a fake binary payload + media_type to the documents table
    * (the fixtures carry no real media; text bytes stand in for the blob).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("media_type",
        when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
          .otherwise(lit("video")))

  /** Metadata extraction — pure projection over the binary column (byte
    * length + deterministic fake dimensions derived from it). At scale this
    * is a narrow codegen'd map over the scan; no shuffle, no decode.
    */
  def mediaMeta(docs: DataFrame): DataFrame = {
    val n = length(col("payload"))
    withPayload(docs)
      .select(
        col("doc_id"),
        col("media_type"),
        n.as("n_bytes"),
        (lit(64) + pmod(n * lit(31), lit(512))).as("width"),
        (lit(64) + pmod(n * lit(17), lit(512))).as("height"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling — one row per fixed-length frame offset, with a
    * per-frame fingerprint. Models video frame extraction: `sequence` +
    * `explode` keep it distributed and codegen'd; the per-frame hash stands
    * in for a per-frame feature.
    */
  def frameSample(docs: DataFrame, frameLen: Int = 100): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), col("n_chars"), col("text"))
      // Empty (or null-length) documents have no frames: sequence(0, -1)
      // would throw "illegal sequence boundaries", so guard to an empty
      // array, which explode() then drops.
      .withColumn("off",
        explode(when(col("n_chars") > 0,
          sequence(lit(0L), col("n_chars") - 1, lit(frameLen.toLong)))
          .otherwise(array().cast("array<long>"))))
      .select(
        col("doc_id"),
        (col("off") / frameLen).cast("long").as("frame_no"),
        col("off"),
        TextFunctions.charFingerprint(
          expr(s"substring(text, off + 1, $frameLen)")).as("frame_fp"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** Resize planning — computes output dimensions that fit `maxDim` while
    * preserving aspect ratio, in pure integer math (codegen'd projection;
    * the actual pixel resample would live in [[decodeFeatures]]'s
    * mapPartitions stage next to the codec).
    */
  def resizeMeta(docs: DataFrame, maxDim: Int = 256): DataFrame =
    mediaMeta(docs)
      .withColumn("width", col("width").cast("long"))
      .withColumn("height", col("height").cast("long"))
      .withColumn("out_w",
        expr(s"CAST(width * $maxDim DIV greatest(width, height) AS BIGINT)"))
      .withColumn("out_h",
        expr(s"CAST(height * $maxDim DIV greatest(width, height) AS BIGINT)"))
      .select(col("doc_id"), col("width"), col("height"), col("out_w"), col("out_h"))
      .orderBy(col("doc_id"))

  /** STUB decode: deterministic fake "decoder". A real deployment swaps
    * the body for an actual codec call; signature, batching, and schema
    * stay identical.
    */
  object StubDecoder {
    /** Fake per-blob feature vector: byte-sum folded into `dims` buckets. */
    def decode(payload: Array[Byte], dims: Int): Array[Double] = {
      val out = new Array[Double](dims)
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xff).toDouble / 255.0
        i += 1
      }
      out
    }

    def checksum(payload: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < payload.length) {
        h = (h * TextFunctions.FpBase + (payload(i) & 0xff)) % TextFunctions.FpPrime
        i += 1
      }
      h
    }
  }

  /** Distributed decode via mapPartitions: decoder state is created once
    * per partition (the expensive part for a real codec), then streamed
    * over the rows — the batch shape a 1000-executor job needs.
    */
  def decodeFeatures(docs: DataFrame, dims: Int = 8): Dataset[MediaFeature] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec context, model…)
        rows.map { case (id, mt, payload) =>
          MediaFeature(id, mt, payload.length,
            StubDecoder.checksum(payload), StubDecoder.decode(payload, dims))
        }
      }
  }

  /** Content-addressed media dedup: group byte-identical payloads by
    * their SHA-256 digest, keep the lowest-id copy, report the copy
    * count — the "same image uploaded N times" dedup every media
    * pipeline runs before feature extraction.
    *
    * Scale shape: ONE hash shuffle keyed on the 32-byte digest (never
    * the payload itself — the blob stays columnar at rest; only digest +
    * scalars cross the wire), decomposable min/count aggregates with
    * map-side partials. Digest collisions are cryptographically
    * negligible, so no byte-level verify pass is needed (unlike the
    * similarity dedups, which must verify their candidates).
    *
    * @param media  DataFrame with an id column and a binary payload column
    */
  def contentDedup(media: DataFrame, idCol: String,
                   payloadCol: String): DataFrame =
    media
      .select(col(idCol), sha2(col(payloadCol), 256).as("digest"),
        length(col(payloadCol)).cast("long").as("__n"))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"),
        min(col(idCol)).as("keep_id"),
        min(col("__n")).as("n_bytes"))
      .orderBy(col("keep_id"))
}
