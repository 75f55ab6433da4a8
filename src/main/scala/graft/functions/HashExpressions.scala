package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst kernels for the signature computations of the dedup
  * tier (SimHash, MinHash). Both consume the PORTABLE polynomial token /
  * shingle hashes from [[TextFunctions]] (reproducible in ANSI SQL for the
  * oracle), and both replace `aggregate`/`transform`/`zip_with` lambda
  * pyramids: the built-in higher-order functions stay interpreted and
  * allocate a lambda frame per element, which at width-48 SimHash means
  * 48 × n_tokens frames per document — measured ~5 s for 5k docs at sf0.1.
  * Here the whole signature compiles to a tight primitive loop inside
  * whole-stage codegen.
  */

/** 64-bit-or-narrower SimHash over a token-hash stream (`array<long>`,
  * duplicates included — each occurrence votes).
  *
  * Each hash is first passed through `mixRounds` rounds of the portable
  * avalanche step `x -> (x * 1021 + 12345) mod prime`: the polynomial
  * token hash of a SHORT token is a small number (a 3-char token fills
  * ~21 bits), so without mixing every signature bit above ~21 is a
  * constant 0 and band buckets degenerate. Six rounds of a 10-bit
  * multiplier push even single-character hashes past the 53-bit modulus,
  * after which values are uniform in [0, prime). All steps stay inside a
  * signed 64-bit long (x < 2^53, x*1021 < 2^63) so ANSI-SQL engines
  * reproduce them exactly.
  *
  * Semantics (bit b of the result, b < width): count +1 for every mixed
  * hash whose bit b is set, -1 otherwise; the signature bit is 1 iff the
  * count is positive. Empty input yields signature 0. Null elements are
  * skipped.
  */
case class SimHashBits(child: Expression, width: Int,
                       mixRounds: Int = SimHashBits.MixRounds,
                       prime: Long = TextFunctions.ShPrime)
    extends UnaryExpression {
  require(width > 0 && width <= 64, s"simhash width must be in (0,64], got $width")

  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val cnt = new Array[Int](width)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        var h = xs.getLong(i)
        var r = 0
        while (r < mixRounds) {
          h = (h * SimHashBits.MixMul + SimHashBits.MixAdd) % prime
          r += 1
        }
        var b = 0
        while (b < width) {
          if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < width) {
      if (cnt(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      // freshName everywhere: two instances of this expression can land in
      // the same generated function (projection collapse / WSCG), where
      // fixed local names would collide and force interpreter fallback.
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val r = ctx.freshName("r"); val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $xs.numElements();
         |int[] $cnt = new int[$width];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$xs.isNullAt($i)) {
         |    long $h = $xs.getLong($i);
         |    for (int $r = 0; $r < $mixRounds; $r++) {
         |      $h = ($h * ${SimHashBits.MixMul}L + ${SimHashBits.MixAdd}L) % ${prime}L;
         |    }
         |    for (int $b = 0; $b < $width; $b++) {
         |      $cnt[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $width; $b++) {
         |  if ($cnt[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashBits {
  /** Avalanche constants — small enough that x*MixMul never leaves a
    * signed long for x < 2^53; six rounds push any nonzero hash past the
    * modulus at least once.
    */
  val MixMul = 1021L
  val MixAdd = 12345L
  val MixRounds = 6
}

/** MinHash signature of a shingle-hash set (`array<long>`): for each of
  * the k affine permutations `(a_i * (x mod p) + b_i) mod p`, the minimum
  * over all elements. One pass over the input, k mins carried — replaces
  * k separate `array_min(transform(...))` scans. Returns NULL for an
  * empty input (no shingles → no signature); callers filter those out.
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long],
                      prime: Long)
    extends UnaryExpression {
  require(as.nonEmpty && as.length == bs.length, "coefficient arity mismatch")

  private val k = as.length
  // O(1) coefficient access in the interpreted path (a Seq could be a
  // List, turning the inner loop O(k²) per element)
  @transient private lazy val asArr: Array[Long] = as.toArray
  @transient private lazy val bsArr: Array[Long] = bs.toArray

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val xm = xs.getLong(i) % prime
        var j = 0
        while (j < k) {
          val v = (asArr(j) * xm + bsArr(j)) % prime
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as.toArray, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val xm = ctx.freshName("xm")
      val j = ctx.freshName("j"); val v = ctx.freshName("v")
      s"""
         |int $n = $xs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$xs.isNullAt($i)) {
         |      long $xm = $xs.getLong($i) % ${prime}L;
         |      for (int $j = 0; $j < $k; $j++) {
         |        long $v = ($asRef[$j] * $xm + $bsRef[$j]) % ${prime}L;
         |        if ($v < $out[$j]) $out[$j] = $v;
         |      }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
