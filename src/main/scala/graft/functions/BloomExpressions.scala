package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable Bloom filter over the polynomial string-hash family — the
  * membership sketch behind incremental dedup ("is this document's key
  * already in the corpus?") without joining the new batch against 100 TB.
  *
  * Spark ships a Bloom pair (`bloom_filter_agg` / `might_contain`) built on
  * xxhash — engine-internal bits, so results could only be rows-checked.
  * This family derives every bit position from the same
  * `(acc*131 + codepoint) mod p` fold and avalanche mixer the rest of the
  * repo uses, which means DuckDB reproduces the EXACT positions and the
  * oracle can verify membership decisions (including false positives)
  * bit-for-bit: the filter flips from "trusted sketch" to "proven".
  *
  * Double hashing (Kirsch–Mitzenmacher): position_i = (h1 + i*h2) mod m,
  * i < k — two derived hashes generate all k probes with no per-probe
  * string work. All arithmetic stays below 2^58, inside both JVM long and
  * ANSI BIGINT range (no overflow, no wrapping divergence).
  */
object BloomKernel {

  /** k bit positions of a key string in an m-bit filter. */
  def positions(key: UTF8String, k: Int, mBits: Int): ArrayData = {
    val h1 = PolyHash.charFold(key, TextFunctions.FpBase, TextFunctions.ShPrime)
    var h2 = h1
    var r = 0
    while (r < SimHashBits.MixRounds) {
      h2 = (h2 * SimHashBits.MixMul + SimHashBits.MixAdd) % TextFunctions.ShPrime
      r += 1
    }
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      out(i) = (h1 + i.toLong * h2) % mBits.toLong
      i += 1
    }
    new GenericArrayData(out)
  }

}

/** `array<long>` of the k double-hashed positions of a string key in
  * [0, mBits). Also the cell-index generator for the count-min sketch
  * (k = depth, mBits = width) — the 64-alignment the Bloom WORD layout
  * needs is enforced by [[BloomWordsAgg]], not here, so count-min widths
  * like the ⌈e/ε⌉ sizing stay legal.
  */
case class BloomPositions(child: Expression, k: Int, mBits: Int)
    extends UnaryExpression {
  require(k > 0 && mBits > 0, "k and mBits must be positive")
  override def prettyName: String = "graft_bloom_positions"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BloomKernel.positions(input.asInstanceOf[UTF8String], k, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BloomKernel.positions($s, $k, $mBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** True iff every bit position is set in the filter's word array
  * ("maybe present" — false = definitely absent).
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(words: Any, positions: Any): Any = {
    val w = words.asInstanceOf[ArrayData]
    val ps = positions.asInstanceOf[ArrayData]
    val n = ps.numElements()
    var i = 0
    while (i < n) {
      val p = ps.getLong(i)
      if (((w.getLong((p >>> 6).toInt) >>> (p & 63)) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, ps) => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = true;
         |int $n = $ps.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $p = $ps.getLong($i);
         |  if ((($w.getLong((int) ($p >>> 6)) >>> ($p & 63)) & 1L) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Bit-array Bloom aggregate: ORs every row's position list into an
  * mBits-bit filter, emitted as `array<long>` of mBits/64 words.
  *
  * Decomposable by construction — each map task builds a partial filter
  * over its partition and the shuffle carries ONE mBits/8-byte buffer per
  * task, never the corpus: the exact shape that keeps an incremental-dedup
  * pass over 100 TB a scan-plus-tiny-reduce instead of a join.
  */
case class BloomWordsAgg(
    positionsExpr: Expression,
    mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")

  override def prettyName: String = "graft_bloom_agg"
  override def children: Seq[Expression] = Seq(positionsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val ps = positionsExpr.eval(input)
    if (ps != null) {
      val arr = ps.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val p = arr.getLong(i)
        buf((p >>> 6).toInt) |= (1L << (p & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): BloomWordsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomWordsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(positionsExpr = newChildren(0))
}
