package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Portable count-min sketch — approximate per-key counts in fixed
  * memory, the frequency twin of the Bloom filter's membership test.
  *
  * Spark's built-in `count_min_sketch` hashes with murmur, so its cells
  * could only be rows-checked. This sketch derives row-r's cell index
  * from the same double-hashed position family as [[BloomPositions]]
  * (`(h1 + r·h2) mod w` over the polynomial fold + avalanche mixer), so
  * DuckDB rebuilds every cell — estimates, collisions and overcounts
  * included — and the oracle verifies the sketch bit-for-bit.
  *
  * Estimate(key) = min over rows r of cell[r][pos_r(key)] ≥ true count,
  * with the classic (ε, δ) guarantee: w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.
  *
  * Scale shape: the aggregate is decomposable — each map task folds its
  * partition into one d·w-cell array and the shuffle carries those
  * partials, never the keys. At 100 TB the sketch answers "how often did
  * this key occur" for ANY key in O(d) reads from a broadcast-able array
  * that never grew past d·w·8 bytes.
  */
case class CountMinAgg(
    positionsExpr: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def prettyName: String = "graft_cm_agg"
  override def children: Seq[Expression] = Seq(positionsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val ps = positionsExpr.eval(input)
    if (ps != null) {
      val arr = ps.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"count-min positions of length ${arr.numElements()} in a " +
          s"depth=$depth sketch — build positions with k = depth")
      var r = 0
      while (r < depth) {
        buf(r * width + arr.getLong(r).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(positionsExpr = newChildren(0))
}

/** min over rows r of sketch[r·width + positions[r]] — the count-min
  * point estimate for the key whose positions these are.
  */
case class CountMinEstimate(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {
  require(width > 0, "width must be positive")
  override def prettyName: String = "graft_cm_estimate"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(sketch: Any, positions: Any): Any = {
    val sk = sketch.asInstanceOf[ArrayData]
    val ps = positions.asInstanceOf[ArrayData]
    val d = ps.numElements()
    require(d.toLong * width <= sk.numElements(),
      s"count-min estimate probes $d rows of width $width but the sketch " +
        s"has only ${sk.numElements()} cells — depth/width mismatch")
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val v = sk.getLong(r * width + ps.getLong(r).toInt)
      if (v < best) best = v
      r += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, ps) => {
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      s"""
         |${ev.value} = Long.MAX_VALUE;
         |int $d = $ps.numElements();
         |if ((long) $d * $width > $sk.numElements()) {
         |  throw new IllegalArgumentException(
         |    "count-min depth/width mismatch: " + $d + " rows of width " +
         |    $width + " vs " + $sk.numElements() + " cells");
         |}
         |for (int $r = 0; $r < $d; $r++) {
         |  long $v = $sk.getLong($r * $width + (int) $ps.getLong($r));
         |  if ($v < ${ev.value}) ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
