package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise running (sum, count) over fixed-dimension vectors. */
final class VecSumBuffer(val dim: Int) {
  val sums = new Array[Double](dim)
  var count = 0L
}

/** Distributed mean pooling of an `array<float>` vector column — the
  * centroid aggregate (class centroids, cluster centers for
  * SemDeDup-style semantic dedup, embedding drift monitors).
  *
  * [[graft.operators.Similarity.trainCentroids]] deliberately trains on a
  * bounded driver-side sample; THIS is the full-corpus path: decomposable
  * (each map task folds its partition into one dim-length sum buffer, the
  * shuffle carries dim·8+8 bytes per task per group), so a 100 TB corpus
  * produces exact per-group centroids in a single pass with no explode
  * fan-out of dim× rows.
  */
case class VectorAvgAgg(
    vecExpr: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  require(dim > 0, "dim must be positive")

  override def prettyName: String = "graft_vec_avg"
  override def children: Seq[Expression] = Seq(vecExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer(dim)

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = vecExpr.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vector of ${arr.numElements()} elements in a dim=$dim aggregate")
      var i = 0
      while (i < dim) {
        // An exact mean has no defined semantics for a null ELEMENT
        // (skip? zero?) — and unsafe rows would silently read 0.0 while
        // generic rows NPE. Reject loudly instead of diverging.
        require(!arr.isNullAt(i),
          s"null element at index $i — vectors must be fully populated")
        buf.sums(i) += arr.getFloat(i)
        i += 1
      }
      buf.count += 1L
    }
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    var i = 0
    while (i < dim) { buf.sums(i) += other.sums(i); i += 1 }
    buf.count += other.count
    buf
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.count == 0L) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + dim * 8)
    bb.putLong(buf.count)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new VecSumBuffer(dim)
    buf.count = bb.getLong
    var i = 0
    while (i < dim) { buf.sums(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vecExpr = newChildren(0))
}
