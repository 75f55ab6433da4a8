package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Sink round-trips (SURVEY.md §2 row S3): every writer in Tables writes
  * what it read — text lines, CSV with schema, and hive-partitioned
  * parquet with partition pruning on re-read.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("text sink round-trips lines, honors the parts knob") {
    val lines = Seq("alpha", "beta", "gamma,with,commas", "").toDF("value")
    val dir = tmp("graft-text") + "/t"
    Tables.writeTextLines(lines, dir, parts = 1)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".txt"))
    assert(files.length == 1, "parts = 1 must yield a single part file")
    val back = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(back.toSeq == Seq("", "alpha", "beta", "gamma,with,commas"))
  }

  test("csv sink round-trips rows and types through the schema'd reader") {
    val df = Seq((1, "Ada", 36, "Paris", 120000.5),
      (2, "Lin", 28, "Lyon", 98000.0))
      .toDF("id", "name", "age", "city", "salary")
    val dir = tmp("graft-csv") + "/c"
    Tables.writeCsv(df, dir)
    val back = Tables.csvWithSchema(spark, dir, Tables.salarySchema)
    assert(back.schema("salary").dataType.typeName == "double")
    val rows = back.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3), r.getDouble(4)))
    assert(rows.toSeq == Seq((1, "Ada", 36, "Paris", 120000.5),
      (2, "Lin", 28, "Lyon", 98000.0)))
  }

  test("json-lines sink round-trips rows and types through the schema'd reader") {
    val df = Seq((1, "Ada", 36, "Paris", 120000.5),
      (2, "Lin", 28, "Lyon", 98000.0))
      .toDF("id", "name", "age", "city", "salary")
    val dir = tmp("graft-json") + "/j"
    Tables.writeJsonLines(df, dir)
    val back = Tables.jsonLines(spark, dir, Tables.salarySchema)
    assert(back.schema("salary").dataType.typeName == "double")
    val rows = back.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3), r.getDouble(4)))
    assert(rows.toSeq == Seq((1, "Ada", 36, "Paris", 120000.5),
      (2, "Lin", 28, "Lyon", 98000.0)))
  }

  test("orc sink round-trips rows and pushes filters on re-read") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    val dir = tmp("graft-orc") + "/o"
    Tables.writeOrc(df, dir)
    val back = Tables.orc(spark, dir).filter(col("id") > 1L)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(id,1)"),
      scan)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("csv quarantine reader captures malformed rows instead of dropping them") {
    val dir = tmp("graft-quar")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name,age,city,salary\n" +
        "1,Ada,36,Paris,120000.5\n" +
        "not-a-number,Bob,oops\n" +            // malformed: bad types, short
        "2,Lin,28,Lyon,98000.0\n")
    val parsed = Tables.csvWithQuarantine(spark, s"$dir/in.csv", Tables.salarySchema)
    val (clean, bad) = Tables.splitQuarantine(parsed)
    assert(clean.count() == 2)
    assert(!clean.columns.contains("_corrupt_record"))
    assert(clean.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("Ada", "Lin"))
    // the malformed line survives WHOLE for the quarantine sink — nothing
    // is silently dropped (unlike the reference's length guard)
    val quarantined = bad.collect()
    assert(quarantined.length == 1)
    assert(quarantined.head.getAs[String]("_corrupt_record")
      .startsWith("not-a-number,Bob"))
    parsed.unpersist()
  }

  test("partitioned parquet sink produces hive-style layout, round-trips") {
    val li = Tables.lineitem(spark, sf001)
    val dir = tmp("graft-part") + "/li"
    Tables.writePartitionedParquet(li, dir, Seq("l_returnflag"),
      maxRecordsPerFile = 1000)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("l_returnflag=")))
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    // partition pruning: reading one flag touches only that directory
    val one = back.filter(col("l_returnflag") === "R")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
    assert(one.count() == li.filter(col("l_returnflag") === "R").count())
  }
}
