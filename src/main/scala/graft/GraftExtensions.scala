package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native deployment surface for the engine's custom expressions.
  *
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) makes
  * every custom codegen expression available to plain SQL —
  * `SELECT poly_hash(text) FROM docs` — with no per-session `register`
  * call. The per-session `register` helpers on each function object
  * remain for programmatic use; both routes build the identical
  * Expression, so plans and results are the same.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRule)
    ext.injectPlannerStrategy(_ => graft.plans.PartitionedTopKStrategy)
  }
}

object GraftExtensions {
  /** Name → builder for every custom expression the engine ships. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash"      -> (e => PolyHash(e.head)),
    "shingle_hashes" -> (e => ShinglePolyHash(e(0), e(1))),
    "vec_dot"        -> (e => VecDot(e(0), e(1))),
    "lsh_bucket"     -> (e => LshBucket(e(0), e(1)))
  )
}
