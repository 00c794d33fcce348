package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for oracle-comparable arithmetic.
  *
  * Floating-point sums depend on accumulation order, which differs
  * between Spark partitions and DuckDB's scan order. Routing the sum
  * through an exact decimal makes the result bit-identical regardless
  * of partitioning — which also means the answer is stable on a
  * 1000-executor cluster, not just on local[32].
  */
object Det {
  /** Order-independent sum of a double column, exact at 4 decimal
    * places, returned as double (exact: |sum| < 2^53 / 10^4).
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Order-independent average (double division of exact operands). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB-side SQL for [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  /** DuckDB-side SQL for [[davg]]. */
  def davgSql(expr: String): String =
    s"${dsumSql(expr)} / COUNT($expr)"
}
