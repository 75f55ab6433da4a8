package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: keeps the k best (score, id) pairs ordered by
  * (score DESC, id ASC).
  *
  * Why a custom aggregate: ranking with a window function
  * (`row_number().over(partitionBy(q).orderBy(...)) <= k`) shuffles EVERY
  * candidate row to the reducer before discarding all but k — at 100 TB
  * corpus scale that is the whole cross product on the wire. This
  * aggregate is algebraic in practice: each map task reduces its partition
  * to ≤ k pairs per group (partial mode), the shuffle carries only those,
  * and merge folds the partials. Network volume drops from O(corpus) to
  * O(k × partitions) per query.
  *
  * Buffer = binary min-heap of size ≤ k whose root is the current WORST
  * kept pair, so admission is O(1) compare + O(log k) replace. Total order
  * (score DESC, id ASC) makes results deterministic under ties.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buf.offer(other.scores(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val rows: Array[Any] = buf.sortedDesc.map { case (s, id) =>
      InternalRow(s, id): Any
    }.toArray
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** Min-heap on (score ASC, id DESC): the root is the worst kept pair under
  * the output order (score DESC, id ASC). Arrays, no boxing.
  */
final class TopKHeap(k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a is strictly worse than b under (score DESC, id ASC). */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def offer(s: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** Kept pairs ordered (score DESC, id ASC) — the output order. */
  def sortedDesc: Seq[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i)))
      .sortBy { case (s, id) => (-s, id) }
}
