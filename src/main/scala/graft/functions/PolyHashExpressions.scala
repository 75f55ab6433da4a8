package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernels for the portable polynomial string hashes
  * (`(acc * 131 + codepoint) mod p` — the exact math of
  * [[TextFunctions.charFingerprint]] / `tokenHashes` /
  * `hashedShingleSet`, which the DuckDB oracle reproduces with
  * `list_reduce`).
  *
  * Why kernels: the Column formulations split the text into a per-char
  * string array and fold with interpreted higher-order functions —
  * per-character allocations down the hottest path of the dedup tier
  * (shingle sets are computed three times per near-dup join: once for the
  * prefix index, once per verification side). Here each hash is one pass
  * over the string's code points.
  *
  * Unicode semantics: identical to `ascii(split(text, ''))` for all BMP
  * text (both walk code points); the fixtures and oracle are BMP-only.
  */
object PolyHash {

  /** Hash of every ' '-separated token (Spark split semantics: empty
    * tokens kept, including trailing — "a " has tokens ["a", ""]).
    */
  def tokenHashes(s: UTF8String, base: Long, mod: Long): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp == ' ') { out += h; h = 0L }
      else h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    out += h
    new GenericArrayData(out.toArray)
  }

  /** Sorted distinct hashed word n-gram shingles (empty when fewer than n
    * tokens) — the fused equivalent of
    * `array_sort(array_distinct(fold-of-n token hashes))`.
    */
  def shingleSet(s: UTF8String, n: Int, base: Long, mod: Long): ArrayData = {
    val th = tokenHashes(s, base, mod)
    val cnt = th.numElements()
    if (cnt < n) return new GenericArrayData(Array.emptyLongArray)
    val m = cnt - n + 1
    val sh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < n) {
        acc = (acc * base + th.getLong(i + j)) % mod
        j += 1
      }
      sh(i) = acc
      i += 1
    }
    java.util.Arrays.sort(sh)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || sh(i) != sh(w - 1)) { sh(w) = sh(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sh, w))
  }

  /** ORDERED rolling window hashes, one per position (duplicates kept,
    * position = array index + 1) — the positions-preserving sibling of
    * [[shingleSet]] for span-level dedup, where WHERE a window occurs
    * matters as much as its value. Empty when fewer than n tokens.
    */
  def windowHashes(s: UTF8String, n: Int, base: Long, mod: Long): ArrayData = {
    val th = tokenHashes(s, base, mod)
    val cnt = th.numElements()
    if (cnt < n) return new GenericArrayData(Array.emptyLongArray)
    val m = cnt - n + 1
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < n) {
        acc = (acc * base + th.getLong(i + j)) % mod
        j += 1
      }
      wh(i) = acc
      i += 1
    }
    new GenericArrayData(wh)
  }

  /** Rolling hash of ALL code points (spaces included) — the kernel twin
    * of [[TextFunctions.charFingerprint]].
    */
  def charFold(s: UTF8String, base: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** `array<long>` of per-token polynomial hashes of a string column. */
case class PolyTokenHashes(child: Expression,
                           base: Long = TextFunctions.FpBase,
                           mod: Long = TextFunctions.ShPrime)
    extends UnaryExpression {
  override def prettyName: String = "graft_token_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PolyHash.tokenHashes(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PolyHash.tokenHashes($s, ${base}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct hashed word n-gram shingle set of a string column. */
case class PolyShingleSet(child: Expression, n: Int,
                          base: Long = TextFunctions.FpBase,
                          mod: Long = TextFunctions.ShPrime)
    extends UnaryExpression {
  require(n > 0, "shingle width must be positive")
  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PolyHash.shingleSet(input.asInstanceOf[UTF8String], n, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PolyHash.shingleSet($s, $n, ${base}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ordered (non-distinct) hashed n-gram window list of a string column —
  * position i (1-based) covers tokens i..i+n-1.
  */
case class PolyWindowHashes(child: Expression, n: Int,
                            base: Long = TextFunctions.FpBase,
                            mod: Long = TextFunctions.ShPrime)
    extends UnaryExpression {
  require(n > 0, "window width must be positive")
  override def prettyName: String = "graft_window_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PolyHash.windowHashes(input.asInstanceOf[UTF8String], n, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PolyHash.windowHashes($s, $n, ${base}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling polynomial hash of a string column's code points. */
case class PolyCharFold(child: Expression,
                        base: Long = TextFunctions.FpBase,
                        mod: Long = TextFunctions.FpPrime)
    extends UnaryExpression {
  override def prettyName: String = "graft_charfold"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PolyHash.charFold(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PolyHash.charFold($s, ${base}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
