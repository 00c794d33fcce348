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

  /** [[dsum]] as a window aggregate (the WindowSpec must attach to the
    * aggregate itself, not to the outer cast).
    */
  def dsumOver(c: Column,
               w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(18, 4))).over(w).cast(DoubleType)

  /** Exact 2-dp decimal view of a money column. Products of these stay
    * exact (decimal multiply), avoiding the double→decimal rounding
    * boundary where Spark (rounds the exact double value) and DuckDB
    * (rounds a 10^scale-scaled double) can disagree by 1 ulp of the
    * last decimal place.
    */
  def money2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact 2-dp decimal of a small factor like (1 - discount). */
  def factor2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact-decimal sum of money * factor products, as double — via
    * [[stableDouble]]: the direct decimal→double cast diverged by 1
    * ulp between engines once the sum crossed 17 significant digits
    * (q1_agg's 3-factor sum_charge at sf1, ~2.8·10¹⁰ at scale 6;
    * caught by the sf1 oracle run).
    */
  def dsumExact(product: Column): Column =
    stableDouble(sum(product))

  /** Engine-stable decimal→double conversion, via the STRING route:
    * decimal→string prints the exact digits in both engines (positive
    * scale never triggers scientific notation), and string→double is
    * ONE correctly-rounded parse in both (Java `Double.parseDouble`,
    * DuckDB strtod/fast_float) — so both engines land on the bit-
    * identical nearest double of the exact decimal value, at ANY
    * magnitude. A direct CAST(decimal AS DOUBLE) is one rounding in
    * Spark (BigDecimal.doubleValue) but TWO in DuckDB (int→double,
    * then scale divide) — a 1-ulp divergence that surfaced in
    * q_stats' corr components at sf0.001. The previous ×10⁴-BIGINT
    * route shared one rounding sequence too, but its envelope
    * (|value|·10⁴ ≤ int64) broke on q_stats' second-moment sums at
    * sf1 (~7·10¹⁹) — the string route has no envelope, which is what
    * a 100 TB aggregate needs. SQL twin: [[stableDoubleSql]].
    */
  def stableDouble(dec: Column): Column =
    dec.cast(org.apache.spark.sql.types.StringType).cast(DoubleType)

  /** DuckDB text of [[stableDouble]] over a decimal SQL expression. */
  def stableDoubleSql(expr: String): String =
    s"CAST(CAST(($expr) AS VARCHAR) AS DOUBLE)"

  /** DuckDB-side SQL for [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  /** DuckDB-side SQL for [[davg]]. */
  def davgSql(expr: String): String =
    s"${dsumSql(expr)} / COUNT($expr)"
}
