package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches a reference Morton interleave") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zValue(Seq(col("a"), col("b"))).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b, 16), s"($a,$b)")
    }
  }

  test("zValue masks high bits instead of overflowing") {
    val df = Seq((70000L, 3L)).toDF("a", "b") // 70000 > 2^16
    val z = df.select(Layout.zValue(Seq(col("a"), col("b")))).collect()(0).getLong(0)
    assert(z == mortonRef(70000L & 0xFFFF, 3L, 16))
  }

  test("z-order layout tightens the second column's per-partition bounds") {
    // Uniform grid over two independent dims. A single-column sort gives
    // each partition the FULL range of the other column; the Z-curve
    // bounds both. Compare the mean normalized extent of dim B.
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(20000)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = rows.toDF("a", "b").repartition(8)
    val parts = 16
    def meanExtentB(laid: org.apache.spark.sql.DataFrame): Double = {
      val stats = laid
        .withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max("b") - min("b")).as("ext"))
        .collect().map(_.getLong(1).toDouble)
      stats.sum / stats.length / (1 << 16)
    }
    val sorted = df.repartitionByRange(parts, col("a"))
      .sortWithinPartitions(col("a"))
    val zOrdered = Layout.zOrderBy(df, Seq(col("a"), col("b")), parts)
    val (se, ze) = (meanExtentB(sorted), meanExtentB(zOrdered))
    // sorted-by-a partitions span ~100% of b; z-order should cut that
    // decisively (16 partitions on a 2-d curve -> ~25-50% per dim)
    assert(se > 0.9, s"sorted layout extent $se")
    assert(ze < 0.6 * se, s"z-order extent $ze vs sorted $se")
  }
}
