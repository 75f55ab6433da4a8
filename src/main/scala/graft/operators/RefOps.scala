package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's three pipelines re-expressed as composable
  * `DataFrame => DataFrame` library operators (SURVEY.md §2.1).
  *
  * Literal-parity tier: these operate on raw text-line DataFrames
  * (`value: string`) and reproduce the reference's exact semantics,
  * including its naive `split(",")` CSV handling and malformed-row drops.
  * The idiomatic tier (schema'd CSV + typed columns) lives in the
  * SparkEntry star-schema queries.
  *
  * Every op is a narrow transformation (no shuffle) except [[avgByCity]],
  * whose single hash-partition exchange is exactly the reference's `keyBy`
  * boundary. At 100 TB all of these scale linearly with input splits;
  * the aggregation shuffles only (key, sum, count) partial rows thanks to
  * Spark's partial→final HashAggregate, mirroring the reference's
  * decomposable (sum,count) accumulator.
  */
object RefOps {

  /** M1 — uppercase passthrough
    * (reference `S3ReadWriteExample.java:26`: `map(String::toUpperCase)`).
    */
  def upperCaseLines(df: DataFrame): DataFrame =
    df.select(upper(col("value")).as("value"))

  /** M2 — naive CSV parse: `value.split(",")`, positional fields, no
    * quoting/escaping (reference `S3FlinkFilterJacksonville.java:58-63`).
    *
    * Faithfulness note: Java's `String.split` DROPS trailing empty fields
    * ("a,b," → 2 fields) while Spark's `split` keeps them (→ 3). The
    * difference is unobservable through every reference pipeline — such
    * rows fail the `length > 3` guard (F1/F2) in both engines for any
    * input that would be affected — so the simpler Spark semantics stand.
    */
  def parseCsv(df: DataFrame): DataFrame =
    df.select(split(col("value"), ",").as("fields"))

  /** F1 — malformed-row guard + city exclusion
    * (reference `S3FlinkFilterJacksonville.java:66-71`:
    * `length > 3 && !f[3].equals(city)`).
    */
  def excludeCity(df: DataFrame, city: String): DataFrame =
    df.filter(size(col("fields")) > 3 && col("fields").getItem(3) =!= city)

  /** F2 — F1 fused with manual header removal
    * (reference `S3FlinkAverageSalaryByCity.java:60-66`: also drops the
    * row whose City field is the literal header sentinel `"City"`).
    */
  def excludeCityAndHeader(df: DataFrame, city: String): DataFrame =
    excludeCity(df, city).filter(col("fields").getItem(3) =!= "City")

  /** M3 — re-serialize fields to a CSV line
    * (reference `S3FlinkFilterJacksonville.java:74-79`: `String.join(",")`).
    */
  def toCsvLine(df: DataFrame): DataFrame =
    df.select(array_join(col("fields"), ",").as("value"))

  /** M4 — project (city, salary, 1L) from positional fields
    * (reference `S3FlinkAverageSalaryByCity.java:68-73`).
    */
  def cityToSalary(df: DataFrame): DataFrame =
    df.select(
      col("fields").getItem(3).as("city"),
      col("fields").getItem(4).cast("double").as("salary"),
      lit(1L).as("one"))

  /** K1+A1+M5 — keyed (sum,count) aggregation then avg = sum/count,
    * final-row semantics (reference `S3FlinkAverageSalaryByCity.java:34-35,
    * 75-88`; the reference's unwindowed reduce emits running prefixes —
    * its last row per key equals this result; the running-emission variant
    * is `graft.streaming.StreamOps.runningAvgByKey`).
    *
    * Returns (city, sum_salary, cnt, avg_salary, line) where `line` is the
    * reference's exact `"%s,%.2f,%d"` formatting
    * (`S3FlinkAverageSalaryByCity.java:86`).
    */
  def avgByCity(df: DataFrame): DataFrame =
    df.groupBy(col("city"))
      .agg(sum(col("salary")).as("sum_salary"), count(lit(1)).as("cnt"))
      .withColumn("avg_salary", col("sum_salary") / col("cnt"))
      .withColumn("line",
        format_string("%s,%.2f,%d", col("city"), col("avg_salary"), col("cnt")))

  /** Full literal pipeline of the filter job
    * (`S3FlinkFilterJacksonville.main`): parse → filter → re-serialize.
    */
  def filterJob(lines: DataFrame, city: String): DataFrame =
    toCsvLine(excludeCity(parseCsv(lines), city))

  /** Full literal pipeline of the average-salary job
    * (`S3FlinkAverageSalaryByCity.main`). */
  def avgSalaryJob(lines: DataFrame, city: String): DataFrame =
    avgByCity(cityToSalary(excludeCityAndHeader(parseCsv(lines), city)))
}
