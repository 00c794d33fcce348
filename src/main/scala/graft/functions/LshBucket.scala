package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH bucket id in one fused pass.
  *
  * `lsh_bucket(v, planes)` where `planes` is a row-major flattened
  * (nPlanes × dim) double matrix: bit j of the result is set iff
  * dot(v, planes[j*dim .. (j+1)*dim)) >= 0. Identical arithmetic to
  * evaluating nPlanes separate dot products (each plane's fold is
  * left-to-right), so the DuckDB oracle — which computes the dots
  * one by one — matches exactly.
  *
  * Replaces nPlanes separate VecDot expressions + a CASE chain: one
  * loop, one codegen function, no per-plane literal duplication. At
  * index-build time this is the map-side operator that assigns every
  * corpus vector to its partition — it runs once per row of the
  * entire corpus.
  */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(vec: Any, planes: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    val p = planes.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val nPlanes = if (dim == 0) 0 else p.numElements() / dim
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += v.getDouble(i) * p.getDouble(j * dim + i)
        i += 1
      }
      if (acc >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val dim = ctx.freshName("dim")
      val np = ctx.freshName("np")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $dim = $v.numElements();
         |int $np = $dim == 0 ? 0 : $p.numElements() / $dim;
         |long $b = 0L;
         |for (int $j = 0; $j < $np; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += $v.getDouble($i) * $p.getDouble($j * $dim + $i);
         |  }
         |  if ($acc >= 0) $b |= 1L << $j;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LshBucket =
    copy(left = newLeft, right = newRight)
}

object LshBucket {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bucket", exprs => LshBucket(exprs(0), exprs(1)), "built-in")

  /** Column wrapper; requires [[register]] on the active session. */
  def lsh_bucket(vec: Column, planes: Column): Column =
    call_function("lsh_bucket", vec, planes)
}
