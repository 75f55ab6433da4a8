package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout-version contract of the persisted indexes: the current
  * version round-trips, the pre-versioning generation (no
  * `format_version` column) stays readable as version 1, and any
  * version outside the supported range refuses loudly with a migration
  * message instead of silently mis-reading the stored tables.
  */
class IndexFormatSpec extends SparkSpec {
  import spark.implicits._

  private val p = Dedup.MinHashParams(numHashes = 32, bands = 8,
    shingle = 3, threshold = 0.2)

  private def docs(ids: Long*): DataFrame =
    ids.map(i => i -> (0 until 8).map(j => s"u${i}t$j").mkString(" "))
      .toDF("doc_id", "text")

  private def rmrf(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  private def restampParams(path: String, v: Option[Int]): Unit = {
    val params = spark.read.parquet(s"$path/params").localCheckpoint()
    val out = v match {
      case Some(n) => params.withColumn("format_version", lit(n))
      case None => params.drop("format_version")
    }
    out.coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  test("current version round-trips; the pre-versioning generation reads " +
      "as version 1; out-of-range versions refuse with a migration " +
      "message") {
    val base = Files.createTempDirectory("graft-fmt").toString
    val ix = s"$base/ix"
    try {
      Dedup.writeSignatureIndex(docs(0L, 1L, 2L), "doc_id", "text", ix, p)
      assert(Dedup.indexFormatVersion(spark, ix) ==
        Dedup.IndexFormatVersion)
      Dedup.readSignatureIndex(spark, ix) // round-trips

      // pre-versioning generation: no format_version column = version 1,
      // fully supported (the legacy fallbacks cover its layouts)
      restampParams(ix, None)
      assert(Dedup.indexFormatVersion(spark, ix) == 1)
      Dedup.readSignatureIndex(spark, ix)

      // a FUTURE layout must refuse, not mis-read
      restampParams(ix, Some(Dedup.IndexFormatVersion + 1))
      val e = intercept[IllegalArgumentException] {
        Dedup.readSignatureIndex(spark, ix)
      }
      assert(e.getMessage.contains("format_version") &&
        e.getMessage.toLowerCase.contains("migrat"), e.getMessage)

      // an ANCIENT layout (below the supported floor) refuses too
      restampParams(ix, Some(0))
      intercept[IllegalArgumentException] {
        Dedup.readSignatureIndex(spark, ix)
      }

      // restore the real stamp: everything works again
      restampParams(ix, Some(Dedup.IndexFormatVersion))
      Dedup.readSignatureIndex(spark, ix)
    } finally rmrf(base)
  }

  test("stampIndexFormatVersion migrates a pre-versioning index in " +
      "place; current is a no-op; a future version still refuses; a " +
      "crashed stamp heals on rerun") {
    val base = Files.createTempDirectory("graft-fmt-stamp").toString
    val ix = s"$base/ix"
    try {
      Dedup.writeSignatureIndex(docs(0L, 1L, 2L), "doc_id", "text", ix, p)
      // current version: no-op
      assert(Dedup.stampIndexFormatVersion(spark, ix) ==
        Dedup.IndexFormatVersion)

      // v1 (pre-versioning): stamped forward in place, geometry intact
      restampParams(ix, None)
      assert(Dedup.indexFormatVersion(spark, ix) == 1)
      val geomBefore = spark.read.parquet(s"$ix/params")
        .drop("format_version").collect().toSeq
      assert(Dedup.stampIndexFormatVersion(spark, ix) ==
        Dedup.IndexFormatVersion)
      assert(Dedup.indexFormatVersion(spark, ix) ==
        Dedup.IndexFormatVersion)
      assert(spark.read.parquet(s"$ix/params").drop("format_version")
        .collect().toSeq == geomBefore,
        "the stamp must not change the recorded geometry")
      Dedup.readSignatureIndex(spark, ix) // still opens

      // a stamp crash mid-swap (params parked under the old-marker)
      // heals on rerun via the compaction recovery sweep
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$ix/params"),
        new org.apache.hadoop.fs.Path(s"$ix/__old_params")))
      assert(Dedup.stampIndexFormatVersion(spark, ix) ==
        Dedup.IndexFormatVersion)
      Dedup.readSignatureIndex(spark, ix)

      // a FUTURE version refuses — nothing to correctly rewrite it to
      restampParams(ix, Some(Dedup.IndexFormatVersion + 1))
      intercept[IllegalArgumentException] {
        Dedup.stampIndexFormatVersion(spark, ix)
      }
    } finally rmrf(base)
  }

  test("digest twin: version stamp round-trips and out-of-range refuses") {
    val base = Files.createTempDirectory("graft-fmt-dig").toString
    val ix = s"$base/ix"
    try {
      Dedup.writeDigestIndex(
        Seq((0L, "da"), (1L, "db")).toDF("id", "dig"), "id", "dig", ix)
      assert(Dedup.indexFormatVersion(spark, ix) ==
        Dedup.IndexFormatVersion)
      Dedup.readDigestIndex(spark, ix)
      restampParams(ix, Some(Dedup.IndexFormatVersion + 1))
      val e = intercept[IllegalArgumentException] {
        Dedup.readDigestIndex(spark, ix)
      }
      assert(e.getMessage.contains("format_version"), e.getMessage)
    } finally rmrf(base)
  }

  test("SRP twin: version stamp round-trips and out-of-range refuses") {
    val base = Files.createTempDirectory("graft-fmt-srp").toString
    val ix = s"$base/ix"
    try {
      Dedup.writeSrpIndex(
        Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))).toDF("id", "v"),
        "id", "v", ix, dim = 2, tables = 2)
      assert(Dedup.indexFormatVersion(spark, ix) ==
        Dedup.IndexFormatVersion)
      Dedup.readSrpIndex(spark, ix)
      restampParams(ix, Some(Dedup.IndexFormatVersion + 1))
      val e = intercept[IllegalArgumentException] {
        Dedup.readSrpIndex(spark, ix)
      }
      assert(e.getMessage.contains("format_version"), e.getMessage)
    } finally rmrf(base)
  }
}
