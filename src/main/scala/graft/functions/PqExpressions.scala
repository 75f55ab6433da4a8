package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): a vector is split into `m`
  * contiguous subspaces of `subDim` dims; each subvector is replaced by
  * the id of its nearest codebook centroid (L2, ties to the lower id).
  * A 64-dim float vector compresses to m small ints — the classic
  * memory/IO lever for corpus-scale ANN (16–64× smaller scan footprint).
  *
  * Scoring is asymmetric distance computation (ADC): the query stays
  * full-precision and is compared against the RECONSTRUCTION (the
  * concatenated centroids selected by the codes), so the returned value
  * is exactly `cosine(q, reconstruction(codes))` — approximation error
  * comes only from quantizing the corpus, never the query.
  *
  * Both kernels are codegen'd expressions; the trained codebook rides in
  * the plan as a codegen reference object (executors need no side input).
  */
object PqKernel {

  /** m codes: per subspace the L2-nearest centroid id (tie → lower id).
    * The vector length must match the codebook's m·subDim — silently
    * zero-padding a wrong-dimension vector would encode garbage.
    */
  def encode(vec: ArrayData, mat: Array[Float], m: Int, k: Int,
             subDim: Int): ArrayData = {
    val n = vec.numElements()
    if (n != m * subDim)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector has $n dims, codebook expects ${m * subDim}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val idx = s * subDim + i
          if (vec.isNullAt(idx))
            throw new IllegalArgumentException(
              s"graft_pq_encode: null element at dim $idx — substituting " +
                "0.0 would encode a plausible but wrong code")
          val x = vec.getFloat(idx).toDouble
          val diff = x - mat(off + i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** cosine(query, reconstruction(codes)); 0.0 when either norm is 0.
    * Codes are validated against (m, k): graft_pq_adc is a registered SQL
    * function, so foreign codes (wrong codebook, wrong m) must raise a
    * diagnosable error, not read another subspace's centroids or walk off
    * the matrix inside generated code.
    */
  def adcCosine(codes: ArrayData, q: ArrayData, mat: Array[Float],
                normsSq: Array[Double], m: Int, k: Int,
                subDim: Int): Double = {
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"graft_pq_adc: expected $m codes, got ${codes.numElements()} — " +
          "codes were not produced by this codebook's graft_pq_encode")
    if (q.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"graft_pq_adc: query has ${q.numElements()} dims, codebook " +
          s"expects ${m * subDim} — silent zero-padding would return a " +
          "plausible but wrong similarity")
    var dot = 0.0
    var nx = 0.0
    var qn = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s))
        throw new IllegalArgumentException(
          s"graft_pq_adc: null code at subspace $s — codes were not " +
            "produced by this codebook's graft_pq_encode")
      val c = codes.getInt(s)
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(
          s"graft_pq_adc: code $c out of range [0, $k) at subspace $s — " +
            "codes were not produced by this codebook's graft_pq_encode")
      val off = (s * k + c) * subDim
      nx += normsSq(s * k + c)
      var i = 0
      while (i < subDim) {
        val idx = s * subDim + i
        if (q.isNullAt(idx))
          throw new IllegalArgumentException(
            s"graft_pq_adc: null query element at dim $idx — substituting " +
              "0.0 would return a plausible but wrong similarity")
        val qi = q.getFloat(idx).toDouble
        dot += qi * mat(off + i).toDouble
        qn += qi * qi
        i += 1
      }
      s += 1
    }
    if (nx == 0.0 || qn == 0.0) 0.0 else dot / math.sqrt(nx * qn)
  }

  /** Per-centroid squared L2 norms of a flat (m·k)×subDim codebook. */
  def centroidNormsSq(mat: Array[Float], rows: Int, subDim: Int): Array[Double] = {
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      var i = 0
      while (i < subDim) {
        val v = mat(r * subDim + i).toDouble
        acc += v * v
        i += 1
      }
      out(r) = acc
      r += 1
    }
    out
  }
}

/** `array<int>` of m PQ codes for an `array<float>` vector. The codebook
  * is held as a Seq so case-class equality stays structural (array
  * identity would defeat Catalyst canonicalization — same rule as
  * [[IvfProbes]]).
  */
case class PqEncode(child: Expression, codebook: Seq[Float], m: Int, k: Int,
                    subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(m > 0 && k > 0 && subDim > 0)
  require(codebook.length == m * k * subDim, "codebook shape mismatch")

  @transient private lazy val mat: Array[Float] = codebook.toArray

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], mat, m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("pqMat", mat, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernel.encode($v, $matRef, $m, $k, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC cosine of (codes: array<int>, query: array<float>) under a trained
  * codebook — exactly `cosine(query, reconstruction(codes))`.
  */
case class PqAdcCosine(left: Expression, right: Expression,
                       codebook: Seq[Float], m: Int, k: Int, subDim: Int)
    extends BinaryExpression {
  require(m > 0 && k > 0 && subDim > 0)
  require(codebook.length == m * k * subDim, "codebook shape mismatch")

  @transient private lazy val mat: Array[Float] = codebook.toArray
  @transient private lazy val normsSq: Array[Double] =
    PqKernel.centroidNormsSq(mat, m * k, subDim)

  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(codes: Any, q: Any): Any =
    PqKernel.adcCosine(codes.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      mat, normsSq, m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("pqMat", mat, "float[]")
    val normsRef = ctx.addReferenceObj("pqNorms", normsSq, "double[]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.functions.PqKernel.adcCosine($c, $q, $matRef, $normsRef, $m, $k, $subDim);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
