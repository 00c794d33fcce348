package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial string hash:
  * fold(7, (acc, cp) => (acc * 31 + cp) mod 1e9+7) over Unicode
  * CODEPOINTS (not UTF-16 code units — `split(s,"")`/`ascii` and
  * DuckDB's `string_split_regex`/`ascii` both yield codepoints, so
  * supplementary-plane characters hash identically across all three).
  *
  * Same value as the composable higher-order-function formulation
  * (`aggregate(split(s, ""), 7, ...)`, see [[graft.llm.Dedup.tokenHash]]),
  * and as the DuckDB oracle's `list_reduce` — but
  * evaluated as a single tight loop inside whole-stage codegen instead
  * of materializing a per-character array per row. On a shingle stream
  * (billions of short strings at 100 TB) this is the difference between
  * a memory-bound array pipeline and a register-bound loop.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 7L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31 + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P = 1000000007L

  def hash(s: String): Long = {
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Register `poly_hash` in the session's function registry (idempotent)
    * — the public route from a custom Expression to a Column.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "built-in")

  /** Column wrapper; requires [[register]] on the active session. */
  def poly_hash(c: Column): Column = call_function("poly_hash", c)
}
