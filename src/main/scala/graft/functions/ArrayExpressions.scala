package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection cardinality of two SORTED ascending distinct `array<long>`
  * columns, via a two-pointer merge — no hash set, no allocation.
  *
  * Why: `size(array_intersect(a, b))` builds a hash set per ROW; in a
  * pairwise near-dup verification the row count is the candidate-pair
  * count (millions per block), so the allocation cost dominates the whole
  * operator. Sorting each set once per document (array_sort, O(n log n),
  * done on the build side of the join) converts every pair check into a
  * linear merge over primitive longs inside whole-stage codegen.
  *
  * Inputs MUST be sorted ascending and duplicate-free (the caller sorts
  * its distinct shingle sets); null elements are not expected.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_intersect_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two instances in one generated function must not collide
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $a.getLong($i), $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sum of per-bucket weights over a hashed-feature list:
  * `sum(weights[h mod B])` for each hash `h` in `left`, with
  * B = weights.length and non-negative hashes (the polynomial token /
  * window hashes are < 2^53). The scoring half of hashed-n-gram
  * importance weighting (DSIR, Xie et al. 2023): the weight vector is a
  * LITERAL array (bounded by the bucket count, broadcast inside the
  * generated code), so scoring a 100 TB corpus is one shuffle-free
  * codegen'd map pass — no join against a feature table, no per-row
  * allocation. Summation is in list order (index 0..n-1), which the
  * oracle reproduces with an ordered `list_reduce` for bit-identical
  * doubles.
  */
case class BucketWeightSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_bucket_score"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val h = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val bCnt = w.numElements()
    var s = 0.0
    var i = 0
    while (i < h.numElements()) {
      s += w.getDouble((h.getLong(i) % bCnt).toInt)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val bCnt = ctx.freshName("bCnt")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |int $bCnt = $b.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $b.getDouble((int) ($a.getLong($i) % $bCnt));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
