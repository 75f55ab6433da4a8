package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token-multiplicity statistics of a string array: sort a copy,
  * then a run-length scan yields (n, n_distinct, top multiplicity,
  * Σ c·ln c) — everything the Gopher top-word rule and the entropy score
  * need, in one codegen'd kernel call instead of an interpreted
  * `array_sort` + `aggregate` HOF chain (measured ~3× on the profilers).
  *
  * The comparator choice is irrelevant to the result — ANY total order
  * groups equal elements adjacently — so there is no cross-engine
  * ordering-parity concern; the Σ c·ln c accumulation runs in ascending
  * order exactly like the HOF formulation it replaces.
  */
object TokenRunStatsKernel {

  def eval(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(a, NullsFirstOrder)
    var nd = 0L
    var top = 0L
    var clnc = 0.0
    var run = 0L
    i = 0
    while (i < n) {
      val isNewRun = i == 0 || !sameToken(a(i), a(i - 1))
      if (isNewRun) {
        if (run > 0) {
          clnc += run.toDouble * math.log(run.toDouble)
          if (run > top) top = run
        }
        run = 1
        nd += 1
      } else run += 1
      i += 1
    }
    if (run > 0) {
      clnc += run.toDouble * math.log(run.toDouble)
      if (run > top) top = run
    }
    new GenericInternalRow(Array[Any](n.toLong, nd, top, clnc))
  }

  private def sameToken(x: UTF8String, y: UTF8String): Boolean =
    if (x == null || y == null) x == null && y == null else x.equals(y)

  private object NullsFirstOrder extends java.util.Comparator[UTF8String] {
    override def compare(x: UTF8String, y: UTF8String): Int =
      if (x == null && y == null) 0
      else if (x == null) -1
      else if (y == null) 1
      else x.compareTo(y)
  }
}

/** struct<n_tokens, n_distinct, top_count, sum_c_ln_c> of an
  * `array<string>` token column — see [[TokenRunStatsKernel]].
  */
case class TokenRunStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_run_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("sum_c_ln_c", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenRunStatsKernel.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TokenRunStatsKernel.eval($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
