package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MetaIO (r19): the driver-side parquet reader/writer for the
  * lifecycle families' small metadata tables must be BYTE-COMPATIBLE
  * with Spark's own parquet writer/reader in both directions — the
  * files it writes are the same tables Spark, older code paths and the
  * DuckDB oracle read, and the files it reads were historically
  * written by Spark. */
class MetaIOSpec extends SparkSpec {
  import MetaIO._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def tmpDir(name: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_metaio_$name"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(conf).delete(p, true)
    d
  }

  test("Spark-written params table reads back via MetaIO (mixed types + string list)") {
    import spark.implicits._
    val d = tmpDir("spark2meta")
    Seq((Seq("l_orderkey", "l_partkey"), 16, 0, 2000L, 0.25, true))
      .toDF("cols", "bits", "files", "mrpf", "threshold", "normalize")
      .coalesce(1).write.mode("overwrite").parquet(d)
    val rows = MetaIO.readTable(conf, d)
    assert(rows.size == 1)
    val r = rows.head
    assert(r("cols") == Seq("l_orderkey", "l_partkey"))
    assert(r("bits") == 16 && r("files") == 0)
    assert(r("mrpf") == 2000L)
    assert(r("threshold") == 0.25)
    assert(r("normalize") == true)
  }

  test("float-matrix byte-compat (r20): Spark-written array<array<float>> " +
      "reads back via MetaIO, and MetaIO-written via Spark") {
    import spark.implicits._
    val mat = Seq(Seq(1.5f, -2.25f), Seq(0f, 3f), Seq())
    // Spark → MetaIO (the legacy IVF params direction)
    val d1 = tmpDir("fm_spark2meta")
    Seq(("a", mat, 4)).toDF("id_col", "centroids", "pq_m")
      .coalesce(1).write.mode("overwrite").parquet(d1)
    val r = MetaIO.readTable(conf, d1).head
    assert(r("id_col") == "a" && r("pq_m") == 4)
    assert(r("centroids") == mat)
    // MetaIO → Spark (the r20 writer direction)
    val d2 = tmpDir("fm_meta2spark")
    MetaIO.writeTable(conf, d2,
      Seq("id_col" -> MString, "centroids" -> MFloatMatrix,
        "pq_m" -> MInt),
      Seq(Seq("a", mat, 4)))
    val row = spark.read.parquet(d2).head()
    assert(row.getAs[String]("id_col") == "a")
    assert(row.getAs[Int]("pq_m") == 4)
    assert(row.getSeq[scala.collection.Seq[Float]](
      row.fieldIndex("centroids")).map(_.toSeq) == mat)
    // and the Spark-inferred schema of both files matches
    assert(spark.read.parquet(d1).schema("centroids").dataType ==
      spark.read.parquet(d2).schema("centroids").dataType)
  }

  test("readTable preserves the file's field order (r20): a positional " +
      "consumer of the reconstructed rows sees the on-disk column order") {
    import spark.implicits._
    val d = tmpDir("fieldorder")
    // column names chosen so hash order ≠ file order would be visible
    Seq((1, 2L, 0.5, "x", true))
      .toDF("zz_first", "aa_second", "mm_third", "bb_fourth", "qq_fifth")
      .coalesce(1).write.mode("overwrite").parquet(d)
    val keys = MetaIO.readTable(conf, d).head.keysIterator.toSeq
    assert(keys ==
      Seq("zz_first", "aa_second", "mm_third", "bb_fourth", "qq_fifth"),
      s"field order not preserved: $keys")
  }

  test("MetaIO-written table reads back via Spark with identical values") {
    val d = tmpDir("meta2spark")
    MetaIO.writeTable(conf, d,
      Seq("cols" -> MStringList, "bits" -> MInt, "files" -> MInt,
        "max_records_per_file" -> MLong, "threshold" -> MDouble,
        "normalize" -> MBoolean),
      Seq(Seq(Seq("a", "b"), 16, 3, 2000L, 0.2, false)))
    val row = spark.read.parquet(d).head()
    assert(row.getSeq[String](row.fieldIndex("cols")) == Seq("a", "b"))
    assert(row.getAs[Int]("bits") == 16)
    assert(row.getAs[Int]("files") == 3)
    assert(row.getAs[Long]("max_records_per_file") == 2000L)
    assert(row.getAs[Double]("threshold") == 0.2)
    assert(!row.getAs[Boolean]("normalize"))
    // schema parity with what Spark's own writer produces
    import spark.implicits._
    val d2 = tmpDir("meta2spark_ref")
    Seq((Seq("a", "b"), 16, 3, 2000L, 0.2, false))
      .toDF("cols", "bits", "files", "max_records_per_file", "threshold",
        "normalize")
      .coalesce(1).write.mode("overwrite").parquet(d2)
    assert(spark.read.parquet(d).schema == spark.read.parquet(d2).schema)
  }

  test("string-name tables round-trip both directions; overwrite drops old rows") {
    import spark.implicits._
    val d = tmpDir("names")
    Seq("f1", "f2", "f3").toDF("name").coalesce(1)
      .write.mode("overwrite").parquet(d)
    assert(MetaIO.readStrings(conf, d).sorted == Seq("f1", "f2", "f3"))
    MetaIO.writeTable(conf, d, Seq("name" -> MString),
      Seq(Seq("g1"), Seq("g2")))
    assert(MetaIO.readStrings(conf, d).sorted == Seq("g1", "g2"))
    assert(spark.read.parquet(d).as[String].collect().sorted.toSeq ==
      Seq("g1", "g2"))
    MetaIO.appendTable(conf, d, Seq("name" -> MString), Seq(Seq("g3")))
    assert(MetaIO.readStrings(conf, d).sorted == Seq("g1", "g2", "g3"))
    assert(spark.read.parquet(d).count() == 3)
  }

  test("long tables round-trip; empty list and missing dir behave") {
    val d = tmpDir("longs")
    MetaIO.writeTable(conf, d, Seq("batch_id" -> MLong),
      Seq(Seq(7L), Seq(9L)))
    assert(MetaIO.readLongs(conf, d).sorted == Seq(7L, 9L))
    assert(spark.read.parquet(d).agg(sum(col("batch_id"))).head().getLong(0)
      == 16L)
    // empty string list survives the round trip
    val d2 = tmpDir("emptylist")
    MetaIO.writeTable(conf, d2, Seq("cols" -> MStringList),
      Seq(Seq(Seq.empty[String])))
    assert(MetaIO.readTable(conf, d2).head.apply("cols") ==
      Seq.empty[String])
    // a missing dir throws (callers keep their transient/permanent
    // classification on top of the raw filesystem error)
    intercept[java.io.FileNotFoundException] {
      MetaIO.readTable(conf, tmpDir("absent") + "/nope")
    }
  }

  test("statsMaxLong answers from footer stats: partitioned table, " +
      "empty table, non-int64 column, absent column") {
    import spark.implicits._
    // Spark-written partitionBy table — the shape the index builds stamp
    val d = tmpDir("statsmax")
    Seq((1L, 0), (42L, 1), (7L, 0), (13L, 2)).toDF("id", "shard")
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(d)
    assert(MetaIO.statsMaxLong(conf, d, "id") == Some(Some(42L)))
    // flat Spark-written table agrees with the scan answer
    val d2 = tmpDir("statsmaxflat")
    spark.range(0L, 1000L).toDF("id").write.parquet(d2)
    assert(MetaIO.statsMaxLong(conf, d2, "id") == Some(Some(999L)))
    assert(spark.read.parquet(d2).agg(max(col("id"))).head().getLong(0)
      == 999L)
    // zero-row table: definitive "no values", NOT a fallback signal
    val d3 = tmpDir("statsmaxempty")
    spark.range(0L, 10L).toDF("id").filter(col("id") < 0L)
      .write.parquet(d3)
    assert(MetaIO.statsMaxLong(conf, d3, "id") == Some(None))
    // non-int64 column: the caller MUST fall back (the scan path owns
    // the cast-health contract there)
    val d4 = tmpDir("statsmaxstr")
    Seq(("a", 1L)).toDF("id", "v").write.parquet(d4)
    assert(MetaIO.statsMaxLong(conf, d4, "id").isEmpty)
    // column absent from a non-empty file: fall back, never guess
    assert(MetaIO.statsMaxLong(conf, d4, "nope").isEmpty)
  }

  test("sparkFileSchema decodes the writer-embedded StructType; " +
      "MetaIO-written files (no Spark metadata) return None") {
    import spark.implicits._
    val d = tmpDir("fileschema")
    val df = Seq((1L, "x", 0.5)).toDF("id", "name", "score")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    val file = new org.apache.hadoop.fs.Path(d).getFileSystem(conf)
      .listStatus(new org.apache.hadoop.fs.Path(d))
      .map(_.getPath).find(p => p.getName.endsWith(".parquet")).get
    val s = MetaIO.sparkFileSchema(conf, file.toString)
    assert(s.contains(df.schema))
    // reading the file WITH the recovered schema equals inference
    assert(spark.read.schema(s.get).parquet(d).collect().toSeq ==
      spark.read.parquet(d).collect().toSeq)
    // a MetaIO-written file carries no Spark footer metadata
    val d2 = tmpDir("fileschemameta")
    MetaIO.writeTable(conf, d2, Seq("name" -> MString), Seq(Seq("g1")))
    val f2 = new org.apache.hadoop.fs.Path(d2).getFileSystem(conf)
      .listStatus(new org.apache.hadoop.fs.Path(d2))
      .map(_.getPath).find(p => p.getName.endsWith(".parquet")).get
    assert(MetaIO.sparkFileSchema(conf, f2.toString).isEmpty)
    // unreadable path: None, never a throw (callers fall back)
    assert(MetaIO.sparkFileSchema(conf, s"$d2/absent.parquet").isEmpty)
  }
}
