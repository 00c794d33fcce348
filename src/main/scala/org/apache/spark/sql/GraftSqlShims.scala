package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Same-package access to the two `private[sql]` factory methods a
  * library that adds its own logical plans needs: LogicalPlan →
  * DataFrame and Column → Expression. This shim-in-the-Spark-package
  * pattern is the standard one used by open-source Spark extension
  * libraries; everything else in graft stays in its own namespace.
  */
object GraftSqlShims {

  /** Wrap a custom LogicalPlan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The Catalyst expression behind a Column (Spark 4 hides it behind
    * ColumnNode conversion).
    */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** A plain-message AnalysisException (the message-only constructor is
    * `private[sql]`) — for function builders that must fail analysis
    * cleanly, e.g. on wrong argument counts.
    */
  def analysisException(message: String): AnalysisException =
    new AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> message))
}
