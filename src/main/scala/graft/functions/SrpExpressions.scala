package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sign-random-projection bucketing for LSH similarity search.
  *
  * One kernel call computes the bucket id of a vector under EVERY hash
  * table: `tables × planesPerTable` hyperplane dot products in a single
  * pass, with the plane matrix attached as a codegen reference object.
  * The alternative — one DotProduct expression per (table, plane) — put
  * 128 literal-array kernels into a single projection, whose generated
  * code took seconds to compile and re-read the vector 128 times.
  *
  * Dot products accumulate in double from float elements (same numeric
  * contract as [[DotProduct]]); `dot >= 0` sets the plane's sign bit.
  */
object SrpHash {

  /** Deterministic pseudo-random hyperplanes for table `t`, fixed seed —
    * identical on every run and every executor.
    */
  def hyperplanes(table: Int, planes: Int, dim: Int): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(7 + 1000 * table)
    Seq.fill(planes)(Seq.fill(dim)((rnd.nextDouble() * 2.0 - 1.0).toFloat))
  }

  /** Flat row-major [tables*planes, dim] plane matrix for the kernel. */
  def planeMatrix(tables: Int, planes: Int, dim: Int): Array[Float] =
    (0 until tables).flatMap(t => hyperplanes(t, planes, dim).flatten).toArray

  /** Kernel body (called from generated code): per-table SRP bucket ids. */
  def buckets(vec: ArrayData, mat: Array[Float], tables: Int,
              planesPerTable: Int, dim: Int): ArrayData = {
    val n = math.min(dim, vec.numElements())
    val out = new Array[Long](tables)
    var t = 0
    var plane = 0
    while (t < tables) {
      var b = 0L
      var j = 0
      while (j < planesPerTable) {
        val off = plane * dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          if (!vec.isNullAt(i)) dot += vec.getFloat(i).toDouble * mat(off + i).toDouble
          i += 1
        }
        if (dot >= 0) b |= (1L << j)
        j += 1
        plane += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<long>` of per-table SRP bucket ids of an `array<float>` vector
  * column (element i = bucket under table i's planes).
  */
case class SrpBuckets(child: Expression, tables: Int, planesPerTable: Int,
                      dim: Int)
    extends UnaryExpression {
  require(tables > 0 && planesPerTable > 0 && planesPerTable <= 63)

  @transient private lazy val mat: Array[Float] =
    SrpHash.planeMatrix(tables, planesPerTable, dim)

  override def prettyName: String = "graft_srp_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SrpHash.buckets(input.asInstanceOf[ArrayData], mat, tables,
      planesPerTable, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("srpMat", mat, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SrpHash.buckets($v, $matRef, $tables, $planesPerTable, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
