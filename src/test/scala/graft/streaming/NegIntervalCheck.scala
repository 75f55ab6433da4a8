package graft.streaming

import graft.SparkSpec

/** Guards the INTERVAL-literal construction in StreamOps.intervalJoinStream:
  * a negative lower bound must parse and shift backwards.
  */
class NegIntervalCheck extends SparkSpec {
  import spark.implicits._
  test("negative INTERVAL seconds literal parses and shifts backwards") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")).toDF("ts")
    val got = df.select(
      org.apache.spark.sql.functions.expr("ts + INTERVAL -10 SECONDS").as("t2"))
      .collect().head.getTimestamp(0)
    assert(got == java.sql.Timestamp.valueOf("2024-01-01 09:59:50"))
  }
}
