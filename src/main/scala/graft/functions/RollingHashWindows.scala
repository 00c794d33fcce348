package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial hashes of EVERY w-codepoint window of a string, computed
  * in one O(n) rolling pass.
  *
  * `rolling_hashes(s, w)[p] == poly_hash(substring(s, p+1, w))` — the
  * exact [[PolyHash]] fold (`fold(7, (acc, cp) => (acc*31 + cp) mod
  * 1e9+7)` over codepoints), so the DuckDB oracle can reproduce every
  * value by hashing the substrings directly. The naive per-position
  * evaluation is O(n·w) (32× the corpus at w=32 — the dominant cost of
  * any substring-fingerprint pass at 100 TB); rolling updates each
  * window from the previous one in O(1):
  *
  *   content(p+1) = (content(p) - cp_p·31^(w-1))·31 + cp_(p+w)
  *   hash(p)      = content(p) + 7·31^w          (all mod 1e9+7)
  *
  * Windows count CODEPOINTS (like `substring` in both engines), so
  * supplementary-plane text hashes identically everywhere.
  */
case class RollingHashWindows(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(text: Any, wAny: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    val w = wAny.asInstanceOf[Int]
    new GenericArrayData(RollingHashWindows.hashes(s, w))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, wv) => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.RollingHashWindows.hashes($s, $wv));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RollingHashWindows =
    copy(left = newLeft, right = newRight)
}

object RollingHashWindows {
  import PolyHash.P

  /** Shared kernel for eval and codegen: O(cps) total, no per-window
    * rescan. (A String-arg static method keeps the generated code a
    * two-liner — the loop JITs identically either way.)
    */
  def hashes(s: String, w: Int): Array[Long] = {
    // Codepoint extraction first: rolling needs cp[p] and cp[p+w]
    // random access, and String.codePointAt is O(1) only by char index.
    var n = 0
    var k = 0
    while (k < s.length) { k += Character.charCount(s.codePointAt(k)); n += 1 }
    if (n < w || w <= 0) return Array.emptyLongArray
    val cps = new Array[Int](n)
    k = 0; var i = 0
    while (k < s.length) {
      val cp = s.codePointAt(k)
      cps(i) = cp; i += 1; k += Character.charCount(cp)
    }
    // 31^(w-1) and 7·31^w mod P.
    var b1 = 1L
    var j = 0
    while (j < w - 1) { b1 = b1 * 31 % P; j += 1 }
    val sevenPow = b1 * 31 % P * 7 % P
    val out = new Array[Long](n - w + 1)
    // content(0)
    var f = 0L
    j = 0
    while (j < w) { f = (f * 31 + cps(j)) % P; j += 1 }
    out(0) = (f + sevenPow) % P
    var p = 1
    while (p <= n - w) {
      // Drop cps(p-1), shift, add cps(p+w-1); keep everything in [0, P).
      f = (f - cps(p - 1) * b1 % P + P) % P
      f = (f * 31 + cps(p + w - 1)) % P
      out(p) = (f + sevenPow) % P
      p += 1
    }
    out
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hashes", exprs => RollingHashWindows(exprs(0), exprs(1)),
      "built-in")

  /** Column wrapper; requires [[register]] on the active session. */
  def rolling_hashes(text: Column, w: Column): Column =
    call_function("rolling_hashes", text, w)
}
