package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hashes of all word n-gram shingles of a token array, WITHOUT
  * materializing the shingle strings.
  *
  * `shingle_hashes(tokens, n)[i] == poly_hash(concat_ws(" ",
  * tokens[i..i+n-1]))` — the space (char 32) is folded between tokens,
  * so values are identical to hashing the joined string (and to the
  * DuckDB oracle, which hashes the actual shingle strings).
  *
  * The composable pipeline (transform + slice + concat_ws, then
  * PolyHash) allocates one string per shingle per row on the
  * interpreted HOF path; this expression is one fused loop over the
  * token buffer. On a 100 TB corpus the shingle stream is the largest
  * intermediate in the dedup pipeline — this removes it entirely.
  */
case class ShinglePolyHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(tokens: Any, nAny: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 7L
      var j = i
      while (j < i + n) {
        if (j > i) acc = (acc * 31 + 32) % PolyHash.P // the ' ' joiner
        val s = arr.getUTF8String(j).toString
        var k = 0
        while (k < s.length) {
          val cp = s.codePointAt(k) // codepoints, see PolyHash scaladoc
          acc = (acc * 31 + cp) % PolyHash.P
          k += Character.charCount(cp)
        }
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, n) => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |int $m = $arr.numElements() - $n + 1;
         |if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $acc = 7L;
         |  for (int $j = $i; $j < $i + $n; $j++) {
         |    if ($j > $i) $acc = ($acc * 31 + 32) % 1000000007L;
         |    java.lang.String $s = $arr.getUTF8String($j).toString();
         |    int $k = 0;
         |    while ($k < $s.length()) {
         |      int $cp = $s.codePointAt($k);
         |      $acc = ($acc * 31 + $cp) % 1000000007L;
         |      $k += java.lang.Character.charCount($cp);
         |    }
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShinglePolyHash =
    copy(left = newLeft, right = newRight)
}

object ShinglePolyHash {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShinglePolyHash(exprs(0), exprs(1)),
      "built-in")

  /** Column wrapper; requires [[register]] on the active session. */
  def shingle_hashes(tokens: Column, n: Column): Column =
    call_function("shingle_hashes", tokens, n)
}
