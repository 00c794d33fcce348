package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization — the canonical-composition
  * pass every text-dedup pipeline runs before hashing: `e` +
  * COMBINING ACUTE (U+0065 U+0301) and precomposed `é` (U+00E9) are
  * the same text but different bytes, so un-normalized corpora
  * under-deduplicate and split token statistics across byte variants.
  *
  * Wraps `java.text.Normalizer` (the JDK's implementation of UAX #15
  * canonical composition — the same algorithm DuckDB's
  * `nfc_normalize` implements via utf8proc, so oracle comparison is
  * exact). Spark ships no normalization built-in; this is the
  * custom-Expression rung of the extension ladder (SURVEY §2.3), not
  * a UDF: null-intolerant, whole-stage-codegen'd, no serialization
  * boundary.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def dataType: DataType = StringType
  // Analysis-time type check: a non-string argument fails with a clear
  // analyzer error instead of a runtime ClassCastException in eval/codegen.
  // (Seq[DataType] <: Seq[AbstractDataType] — the parent type is
  // private[sql] and cannot be named here.)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcNormalize.nfc(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.isNormalized(
         |      $s, java.text.Normalizer.Form.NFC)
         |    ? $s
         |    : java.text.Normalizer.normalize(
         |        $s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Scala-side twin of the codegen body (isNormalized fast path: for
    * the common already-NFC corpus this is a linear scan with zero
    * allocation — normalize() would copy every row).
    */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Register `nfc_normalize` in the session's function registry
    * (idempotent) — the public route from the Expression to a Column.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")

  /** Column wrapper; requires [[register]] on the active session. */
  def nfc_normalize(c: Column): Column = call_function("nfc_normalize", c)
}
