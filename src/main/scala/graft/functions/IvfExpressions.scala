package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** IVF (inverted-file) coarse-quantizer probing: for a vector, the
  * `nprobe` nearest centroid ids by inner product (centroids are
  * L2-normalized by the trainer, so inner-product order = cosine order).
  * One kernel call scans the centroid matrix once; ties break on the
  * lower centroid id for determinism.
  */
object IvfProbe {
  def probes(vec: ArrayData, mat: Array[Float], c: Int, dim: Int,
             nprobe: Int): ArrayData = {
    val n = math.min(dim, vec.numElements())
    val dots = new Array[Double](c)
    var ci = 0
    while (ci < c) {
      val off = ci * dim
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) dot += vec.getFloat(i).toDouble * mat(off + i).toDouble
        i += 1
      }
      dots(ci) = dot
      ci += 1
    }
    val m = math.min(nprobe, c)
    val ids = new Array[Int](m)
    val best = new Array[Double](m)
    var filled = 0
    ci = 0
    while (ci < c) {
      val d = dots(ci)
      // insertion into the running top-m (dot DESC, id ASC)
      var pos = filled
      while (pos > 0 && (best(pos - 1) < d)) pos -= 1
      if (pos < m) {
        val last = math.min(filled, m - 1)
        var j = last
        while (j > pos) { ids(j) = ids(j - 1); best(j) = best(j - 1); j -= 1 }
        ids(pos) = ci; best(pos) = d
        if (filled < m) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(ids.take(filled))
  }
}

/** `array<int>` of the nprobe nearest centroid ids of an `array<float>`
  * vector column. The centroid matrix is data (trained), so it rides in
  * the expression as a codegen reference object. Held as a Seq (not an
  * Array) so case-class equality is STRUCTURAL — array identity would
  * make two identical probe expressions compare unequal and defeat
  * Catalyst subexpression elimination / canonicalization.
  */
case class IvfProbes(child: Expression, centroids: Seq[Float], c: Int,
                     dim: Int, nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(c > 0 && dim > 0 && nprobe > 0)
  require(centroids.length == c * dim, "centroid matrix shape mismatch")

  @transient private lazy val mat: Array[Float] = centroids.toArray

  override def prettyName: String = "graft_ivf_probes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    IvfProbe.probes(input.asInstanceOf[ArrayData], mat, c, dim, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("ivfMat", mat, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IvfProbe.probes($v, $matRef, $c, $dim, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
