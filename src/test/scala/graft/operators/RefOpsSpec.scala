package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Golden end-to-end tests of the reference pipelines on the reference's
  * own bundled inputs (copied to test resources; see FIXTURES.md §A):
  * `input.txt` for the uppercase job, `salary.csv` for the filter and
  * average-salary jobs — plus a multi-row-city fixture to exercise the
  * (sum, count) merge path the bundled data never hits (every city there
  * is unique).
  */
class RefOpsSpec extends SparkSpec {

  test("uppercase passthrough: digits are fixed points (S3ReadWriteExample)") {
    val in = Tables.textLines(spark, resource("input.txt"))
    val out = RefOps.upperCaseLines(in).orderBy("value").collect().map(_.getString(0))
    assert(out.toSeq == Seq("1", "2", "3", "4", "5", "6"))
  }

  test("uppercase maps lowercase lines") {
    import spark.implicits._
    val out = RefOps.upperCaseLines(Seq("hello world", "MiXeD").toDF("value"))
      .orderBy("value").collect().map(_.getString(0))
    assert(out.toSeq == Seq("HELLO WORLD", "MIXED"))
  }

  test("filter job drops Jacksonville and malformed rows, keeps the rest") {
    val lines = Tables.textLines(spark, resource("salary.csv"))
    val out = RefOps.filterJob(lines, "Jacksonville").collect().map(_.getString(0))
    // 101 lines (header + 100 rows) minus exactly one Jacksonville row
    assert(out.length == 100)
    assert(!out.exists(_.contains("Jacksonville")))
    // header survives F1 (only F2 drops it) — literal reference semantics
    assert(out.contains("ID,Name,Age,City,Salary"))
    // round-trip re-serialization is byte-identical for unquoted CSV
    assert(out.contains("1,John Smith,32,New York,65000"))
  }

  test("filter job drops rows with <= 3 fields (malformed-row guard)") {
    import spark.implicits._
    val lines = Seq("a,b,c", "a,b,c,KeepCity,5", "short").toDF("value")
    val out = RefOps.filterJob(lines, "Gone").collect().map(_.getString(0))
    assert(out.toSeq == Seq("a,b,c,KeepCity,5"))
  }

  test("avg-salary job on salary.csv: one row per city, count 1, avg = salary") {
    val lines = Tables.textLines(spark, resource("salary.csv"))
    val out = RefOps.avgSalaryJob(lines, "Jacksonville")
    val rows = out.orderBy("city").collect()
    assert(rows.length == 99) // 100 cities - Jacksonville (header dropped by F2)
    assert(rows.forall(_.getLong(2) == 1L))
    val ny = rows.find(_.getString(0) == "New York").get
    assert(ny.getDouble(1) == 65000.0)           // sum
    assert(ny.getDouble(3) == 65000.0)           // avg
    assert(ny.getString(4) == "New York,65000.00,1") // "%s,%.2f,%d" format
  }

  test("avg-salary job merges multi-row cities (the (sum,count) reduce path)") {
    import spark.implicits._
    val lines = Seq(
      "ID,Name,Age,City,Salary",
      "1,A A,30,X,100",
      "2,B B,31,X,200",
      "3,C C,32,Y,50",
      "4,D D,33,Jacksonville,999").toDF("value")
    val out = RefOps.avgSalaryJob(lines, "Jacksonville")
      .orderBy("city").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq(("X", 300.0, 2L, 150.0), ("Y", 50.0, 1L, 50.0)))
    assert(out.head.getString(4) == "X,150.00,2")
  }

  test("text sink writes one line per record (rolling sink analog)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sink").toString + "/out"
    Tables.writeTextLines(Seq("x", "y", "z").toDF("value"), dir, parts = 1)
    val back = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(back.toSeq == Seq("x", "y", "z"))
  }

  test("schema'd CSV read (idiomatic tier) types the salary column") {
    val df = Tables.csvWithSchema(spark, resource("salary.csv"), Tables.salarySchema)
    assert(df.schema("salary").dataType.typeName == "double")
    val jackson = df.filter(col("city") === "Jacksonville").collect()
    assert(jackson.length == 1 && jackson.head.getAs[Double]("salary") == 59000.0)
  }
}
