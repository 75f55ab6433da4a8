package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** K-minimum-values (KMV) distinct-count synopsis with SET ALGEBRA —
  * the sketch tier's fourth leg beside count-min (point frequencies),
  * Bloom (membership) and HLL (plain distinct counts): a KMV sketch
  * supports UNION and, unlike HLL, principled INTERSECTION cardinality
  * estimation (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD 2007). The LLM-pipeline use is
  * overlap SIZING: "how many distinct n-grams do corpus A and benchmark
  * B share" answered from two k·8-byte synopses — the number that
  * decides whether a decontamination pass is worth scheduling — where
  * t18's exact matrix would rescan both corpora.
  *
  * Representation: the k smallest DISTINCT 64-bit hash values of the
  * input in unsigned order (callers hash with `xxhash64`, uniform on
  * the full unsigned range). With u(h) = the hash mapped to (0,1),
  * the estimator is n̂ = (k−1)/u(h_(k)) once k values were seen, and
  * EXACT below k (the sketch simply holds every distinct hash).
  * Intersection (the 2007 K-min combine): take the K' = min(k, |A∪B
  * minima|) smallest of the merged minima L; ρ = |L ∩ A ∩ B| / K' is an
  * unbiased Jaccard estimate over the union sample, and n̂∩ = ρ · n̂∪
  * with n̂∪ estimated from L's K'-th minimum. Everything is mergeable:
  * group sketches union-fold into rollups without rescanning data.
  *
  * Scale shape: the aggregate is decomposable (map-side partials carry
  * at most k longs per group), the sketch table is O(groups · k) and
  * broadcastable, and every set-algebra answer is O(k log k) driver- or
  * row-local work — corpus scans happen exactly once, at build time.
  *
  * Accuracy: rsd ≈ 1/√(k−2) for distinct estimates; intersection error
  * scales with the UNION size (σ(ρ) ≤ 1/(2√k) ⇒ |est − exact| ≲
  * |A∪B|/(2√k) + rsd·|A∩B|), which is what the self-verifying oracle
  * rows bound against (see SparkEntry a6/a7). Verified in
  * `SketchAccuracySpec` at sf0.001 and sf0.1.
  */
object KmvOps {
  def validateK(k: Int): Unit =
    require(k >= 16, s"KMV k must be >= 16 (rsd ~ 1/sqrt(k-2)), got $k")

  /** Unsigned-order comparable form (flip the sign bit). */
  @inline private def flip(h: Long): Long = h ^ Long.MinValue

  /** h as a uniform (0, 1) coordinate: top 53 bits (double-exact),
    * +1 so the smallest hash never maps to zero. */
  @inline private def unit(h: Long): Double =
    ((h >>> 11) + 1).toDouble / (1L << 53).toDouble

  /** A sketch is a bare array<long> that does not carry its k; one
    * holding MORE than k minima was necessarily built with a larger k,
    * and trusting the caller's k would silently bias the estimate (the
    * K-th minimum of a larger-k sketch sits lower than the true K-th
    * minimum of the data). Cheap partial guard — equal-k mixes where
    * both sides saturate identically are indistinguishable by size. */
  @inline private def checkK(m: Int, k: Int, fn: String): Unit =
    require(m <= k,
      s"$fn: sketch holds $m minima > k=$k — built with a larger k; " +
        "mixing sketch ks silently biases the estimate")

  /** Distinct-count estimate from a sketch (ascending-unsigned minima
    * array, as produced by the aggregates). Exact below k. */
  def estimate(sketch: ArrayData, k: Int): Double = {
    val m = sketch.numElements()
    checkK(m, k, "graft_kmv_estimate")
    if (m < k) m.toDouble
    else (k - 1).toDouble / unit(sketch.getLong(k - 1))
  }

  /** Intersection-cardinality estimate of two sketches built with the
    * same k. Exact when BOTH sides hold fewer than k minima (each
    * sketch is then its side's full distinct-hash set). */
  def intersectEstimate(a: ArrayData, b: ArrayData, k: Int): Double = {
    val na = a.numElements(); val nb = b.numElements()
    checkK(na, k, "graft_kmv_intersect")
    checkK(nb, k, "graft_kmv_intersect")
    var ia = 0; var ib = 0
    var kept = 0 // |L| built so far (merged ascending-unsigned minima)
    var common = 0 // |L ∩ A ∩ B|
    var last = 0L // last merged value (for the K'-th minimum)
    val cap = math.min(k, na.toLong + nb) // upper bound; dedup shrinks
    while (kept < cap && (ia < na || ib < nb)) {
      val ha = if (ia < na) a.getLong(ia) else 0L
      val hb = if (ib < nb) b.getLong(ib) else 0L
      val takeA = ib >= nb || (ia < na && flip(ha) <= flip(hb))
      val h = if (takeA) ha else hb
      val inBoth = ia < na && ib < nb && ha == hb
      if (takeA) ia += 1 else ib += 1
      if (inBoth) { if (takeA) ib += 1 else ia += 1 }
      kept += 1
      last = h
      if (inBoth) common += 1
    }
    if (kept == 0) return 0.0
    if (na < k && nb < k) return common.toDouble // both sides exact
    val unionEst =
      if (kept < k) kept.toDouble else (kept - 1).toDouble / unit(last)
    common.toDouble / kept * unionEst
  }

  /** Shared bounded-minima buffer for both aggregates: a sorted set of
    * the k unsigned-smallest distinct hashes. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })
    def add(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last) < 0) {
        set.add(h)
        if (set.size > k) set.pollLast()
        ()
      }
    }
    def toSortedArray: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val arr = buf.toSortedArray
    val bb = java.nio.ByteBuffer.allocate(4 + arr.length * 8)
    bb.putInt(buf.k)
    bb.asLongBuffer().put(arr)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val buf = new Buffer(k)
    val lb = bb.asLongBuffer()
    while (lb.hasRemaining) buf.set.add(lb.get())
    buf
  }
}

/** Base for the two KMV aggregates: identical buffer/merge/eval,
  * different per-row update.
  *
  * NO constructor-body validation here: this class is the first
  * non-serializable ancestor of its serializable case-class children,
  * so Java deserialization re-runs ITS no-arg constructor with the
  * child's fields still unset — a `require(k >= …)` in this body reads
  * k = 0 on every executor and kills the task. k is validated where
  * the fields exist: [[KmvOps.validateK]] at buffer creation (and in
  * the function builders at construction time). */
abstract class KmvAggBase extends TypedImperativeAggregate[KmvOps.Buffer] {
  def k: Int

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def createAggregationBuffer(): KmvOps.Buffer = {
    KmvOps.validateK(k)
    new KmvOps.Buffer(k)
  }

  override def merge(buf: KmvOps.Buffer, other: KmvOps.Buffer): KmvOps.Buffer = {
    val it = other.set.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }
  override def eval(buf: KmvOps.Buffer): Any =
    new GenericArrayData(buf.toSortedArray)
  override def serialize(buf: KmvOps.Buffer): Array[Byte] = KmvOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvOps.Buffer =
    KmvOps.deserialize(bytes)
}

/** Build a KMV sketch from a LONG hash column (hash upstream with
  * `xxhash64(...)` — codegen'd, uniform on the unsigned 64-bit range).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  override def prettyName: String = "graft_kmv_agg"
  override def children: Seq[Expression] = Seq(child)

  override def update(buf: KmvOps.Buffer, input: InternalRow): KmvOps.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** UNION-merge KMV sketches (each input row an `array<long>` sketch
  * built with the same k) — the mergeable-rollup path: group sketches
  * fold into any coarser grouping without rescanning raw data. */
case class KmvUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  override def prettyName: String = "graft_kmv_union_agg"
  override def children: Seq[Expression] = Seq(child)

  override def update(buf: KmvOps.Buffer, input: InternalRow): KmvOps.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      // input sketches built with a larger k than this rollup's would
      // silently bias the union estimate — same guard as the estimators
      require(n <= k,
        s"graft_kmv_union_agg: input sketch holds $n minima > k=$k — " +
          "built with a larger k; mixing sketch ks biases the estimate")
      while (i < n) { buf.add(arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Distinct-count estimate of a KMV sketch (exact below k). */
case class KmvEstimate(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 16, s"KMV k must be >= 16, got $k")
  override def prettyName: String = "graft_kmv_estimate"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(sketch: Any): Any =
    KmvOps.estimate(sketch.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, sk =>
      s"graft.functions.KmvOps.estimate($sk, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Intersection-cardinality estimate of two same-k KMV sketches. */
case class KmvIntersectEstimate(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 16, s"KMV k must be >= 16, got $k")
  override def prettyName: String = "graft_kmv_intersect"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvOps.intersectEstimate(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.KmvOps.intersectEstimate($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
