package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column (canonical composition —
  * `e + U+0301` becomes `é`), the pre-stage the shingle-based dedup
  * family needs before byte-level hashing: two canonically-equivalent
  * encodings of the same text produce DIFFERENT shingle hashes, so
  * without normalization an NFD copy of an NFC document sails through
  * MinHash/SimHash/fingerprint dedup as "novel".
  *
  * Kernel = the JDK's `java.text.Normalizer` (the same ICU-derived
  * tables DuckDB's `nfc_normalize` uses, which is what the oracle
  * checks). The already-normalized fast path — all ASCII, and most
  * real-world UTF-8 — returns the input UTF8String untouched, no
  * allocation beyond the transient check. Codegen'd so the projection
  * stays inside whole-stage codegen like the rest of the text kernels.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_nfc"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val js = s.toString
    if (java.text.Normalizer.isNormalized(js, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(js, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val js = ctx.freshName("js")
      s"""
         |String $js = $s.toString();
         |${ev.value} =
         |  java.text.Normalizer.isNormalized($js, java.text.Normalizer.Form.NFC)
         |    ? $s
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($js, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
