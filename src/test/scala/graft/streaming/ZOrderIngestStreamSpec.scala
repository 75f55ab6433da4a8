package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{Layouts, Tables}

/** Streaming ingest into a maintained z-ordered layout
  * (`StreamOps.zOrderedIngestStream`): micro-batches land exactly-once
  * (the layout's own batch ledger, carried across reclusters, is the
  * commit record), the measured trigger self-optimizes the layout as
  * it grows, and restarts neither lose nor duplicate rows.
  */
class ZOrderIngestStreamSpec extends SparkSpec {

  private def bag(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupMapReduce(identity)(_ => 1)(_ + _)

  test("micro-batches append exactly-once; the measured trigger " +
      "reclusters mid-stream; a restart with no new data is a no-op; " +
      "a late file lands as its own batch") {
    val li = Tables.table(spark, sf001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    val base = Files.createTempDirectory("graft-zingest").toString
    val in = s"$base/in"; val lay = s"$base/lay"; val cp = s"$base/cp"
    // the layout exists before the stream (the stream is an ingest
    // path, not a create path)
    val boot = li.filter(col("l_orderkey") <= 3000)
    Layouts.writeZOrderedMaintained(boot, lay,
      Seq("l_orderkey", "l_partkey"), maxRecordsPerFile = 500L)
    val slice1 = li.filter(col("l_orderkey") > 3000 &&
      col("l_orderkey") <= 7000)
    slice1.coalesce(1).write.parquet(in)
    // tiny threshold: the trigger must FIRE during the stream
    val q = StreamOps.zOrderedIngestStream(spark, in, slice1.schema,
      lay, cp, reclusterThreshold = 0.01)
    q.processAllAvailable(); q.awaitTermination(120000)
    val want1 = bag(boot.unionByName(slice1))
    assert(bag(spark.read.parquet(lay)) == want1)
    assert(Layouts.zOrderFragmentation(spark, lay) == 0.0,
      "in-stream maintenance did not recluster")

    // restart over the same checkpoint, no new input: nothing changes
    val q2 = StreamOps.zOrderedIngestStream(spark, in, slice1.schema,
      lay, cp, reclusterThreshold = 0.01)
    q2.processAllAvailable(); q2.awaitTermination(120000)
    assert(bag(spark.read.parquet(lay)) == want1)

    // a late input file is its own batch; earlier rows kept exactly
    val slice2 = li.filter(col("l_orderkey") > 7000)
    slice2.coalesce(1).write.mode("append").parquet(in)
    val q3 = StreamOps.zOrderedIngestStream(spark, in, slice1.schema,
      lay, cp, reclusterThreshold = 0.01)
    q3.processAllAvailable(); q3.awaitTermination(120000)
    val want2 = bag(boot.unionByName(slice1).unionByName(slice2))
    assert(bag(spark.read.parquet(lay)) == want2)
    assert(Layouts.zOrderFragmentation(spark, lay) == 0.0)
    // and the post-ingest read is a plain pruned layout read
    assert(spark.read.parquet(lay)
      .filter(col("l_orderkey").between(100, 1500)).count() ==
      li.filter(col("l_orderkey").between(100, 1500)).count())
  }
}
