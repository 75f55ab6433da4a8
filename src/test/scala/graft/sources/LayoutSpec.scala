package graft.sources

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
        Layouts.zValue(Seq(col("a"), col("b"))).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b, 16), s"($a,$b)")
    }
  }

  test("zValue masks high bits instead of overflowing") {
    val df = Seq((70000L, 3L)).toDF("a", "b") // 70000 > 2^16
    val z = df.select(Layouts.zValue(Seq(col("a"), col("b")))).collect()(0).getLong(0)
    assert(z == mortonRef(70000L & 0xFFFF, 3L, 16))
  }

  test("zValue interleaves three columns (bit b of col i at b*n+i)") {
    def ref(vals: Seq[Long], bits: Int): Long = {
      val n = vals.length
      (for { (v, i) <- vals.zipWithIndex; b <- 0 until bits }
        yield ((v >> b) & 1L) << (b * n + i)).sum
    }
    val rnd = new scala.util.Random(47)
    val rows = Seq.fill(100)(
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong,
        rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layouts.zValue(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    rows.foreach { case t @ (a, b, c) =>
      assert(got(t) == ref(Seq(a, b, c), 16), t)
    }
  }

  test("scaled stays monotone on domains too wide for long multiply") {
    // span ~ 2^62: (c - lo) * (2^16 - 1) wraps in long arithmetic —
    // the regression this guards is a silently scrambled curve
    val lo = Long.MinValue / 2
    val hi = Long.MaxValue / 2
    val vals = Seq(lo, lo / 2, -1000000L, 0L, 1000000L, hi / 2, hi)
    val out = vals.toDF("v")
      .select(col("v"), Layouts.scaled(col("v"), lo, hi, 16).as("s"))
      .orderBy(col("v"))
      .collect().map(r => r.getLong(1))
    assert(out.zip(out.tail).forall { case (x, y) => x <= y },
      s"non-monotone: ${out.mkString(",")}")
    assert(out.head == 0L && out.last >= (1L << 15),
      s"degenerate scaling: ${out.mkString(",")}")
    assert(out.forall(s => s >= 0 && s <= (1L << 16) - 1))
    assert(out.distinct.length > 3, "wide domain collapsed to few buckets")
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
    val zOrdered = Layouts.zOrderBy(df, Seq(col("a"), col("b")), parts)
    val (se, ze) = (meanExtentB(sorted), meanExtentB(zOrdered))
    // sorted-by-a partitions span ~100% of b; z-order should cut that
    // decisively (16 partitions on a 2-d curve -> ~25-50% per dim)
    assert(se > 0.9, s"sorted layout extent $se")
    assert(ze < 0.6 * se, s"z-order extent $ze vs sorted $se")
  }
}
