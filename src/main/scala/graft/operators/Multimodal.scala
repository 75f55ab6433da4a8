package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multimodal-column plumbing (north-star tier, SURVEY.md §2.3): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction as distributed
  * per-partition batch jobs.
  *
  * The image path is a REAL codec: [[ImageCodec]] PNG-encodes and decodes
  * through `javax.imageio` (pure JVM, headless-safe), and the m4 oracle
  * verifies the decoded pixels bit-for-bit. Audio/video decode — which
  * WOULD need native codecs this container lacks — keeps the identical
  * plumbing with a test-double decoder in the spec suite. The Spark-side
  * shape is what matters at 100 TB: binary columns ride through parquet
  * scans untouched (no row-level decode in Catalyst), metadata extraction
  * is a codegen'd projection, and heavy decoding runs via `mapPartitions`
  * so per-partition setup (a codec context opens once per partition, not
  * per row) is amortized — the Scala analog of a Pandas-UDF `mapInPandas`
  * batch.
  */
object Multimodal {

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

  /** Decoded-image feature row: real dimensions plus exact integer pixel
    * statistics (order- and channel-sensitive), all BIGINT so the oracle
    * compare is exact in any engine.
    */
  final case class ImageFeature(doc_id: Long, width: Long, height: Long,
                                n_pixels: Long, pix_sum: Long, pix_wsum: Long)

  /** REAL pure-JVM image codec (javax.imageio — no native libraries, works
    * headless): tiny deterministic RGB test-card images, PNG-encoded with
    * `ImageIO.write` and decoded back with `ImageIO.read`. PNG is lossless,
    * so decode(encode(pattern)) returns the exact pixel grid — which makes
    * the whole codec round-trip oracle-checkable: DuckDB reproduces the
    * pattern arithmetic directly, and any encoder/decoder deviation
    * (dimension swap, channel order, row order, color management) breaks
    * the integer parity.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    // ImageIO needs no display, but pin headless (when unset) so a stray
    // DISPLAY env var never routes AWT to X11 inside executor JVMs.
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")

    /** Deterministic per-id test card: w in 4..8, h in 4..8, channel
      * values are small affine patterns of (id, x, y) mod 256 — the same
      * formulas the m4 oracle SQL evaluates.
      */
    def synthPng(id: Long): Array[Byte] = {
      val w = (4 + Math.floorMod(id, 5)).toInt
      val h = (4 + Math.floorMod(id / 5, 5)).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = Math.floorMod(id * 31 + x * 7 + y * 13, 256).toInt
          val g = Math.floorMod(id * 17 + x * 3 + y * 29, 256).toInt
          val b = Math.floorMod(id * 53 + x * 11 + y * 5, 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode a PNG/BMP payload and reduce it to exact integer features:
      * dimensions, Σ(r+g+b), and the position-weighted
      * Σ(r + 2g + 3b)·(y·w + x + 1) — the weight makes pixel ORDER and
      * channel assignment observable, so a decoder that flips rows or
      * swaps channels fails the oracle even when the plain sum matches.
      */
    def decode(id: Long, payload: Array[Byte]): ImageFeature = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"ImageCodec.decode: payload for id $id is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var wsum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sum += r + g + b
          wsum += (r + 2L * g + 3L * b) * (y.toLong * w + x + 1)
          x += 1
        }
        y += 1
      }
      ImageFeature(id, w.toLong, h.toLong, w.toLong * h, sum, wsum)
    }
  }

  /** Attach a REAL (tiny, deterministic) PNG payload per row — stands in
    * for the media fixture this sandbox cannot ship. Encoding runs in
    * `mapPartitions` so a real encoder's per-partition context cost is
    * amortized; the blob then rides as an opaque binary column like any
    * production media column.
    */
  def imagePayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { ids =>
        // per-partition encoder init would go here (codec context)
        ids.map(id => (id, ImageCodec.synthPng(id)))
      }
      .toDF(idCol, "payload")
  }

  /** Distributed REAL image decode via mapPartitions: decoder state is
    * created once per partition (the expensive part for a codec), then
    * streamed over the rows — the batch shape a 1000-executor job needs.
    * Per-row output is a handful of BIGINTs: the decoded pixels never
    * cross a shuffle, only the reduced features do.
    */
  def decodeImageFeatures(media: DataFrame, idCol: String,
                          payloadCol: String): Dataset[ImageFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec context, model…)
        rows.map { case (id, payload) => ImageCodec.decode(id, payload) }
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
