package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (the UDAF surface): exact top-k values per
  * group with a BOUNDED, MERGEABLE buffer.
  *
  * Spark has no built-in top-k aggregate — the usual window
  * (row_number ≤ k) shuffles and sorts every row of every group. This
  * aggregator keeps at most k values per partition-local partial
  * (`reduce`), and `merge` combines two ≤k buffers — so a 100 TB group
  * ships k doubles per partition instead of its whole payload, the
  * same partial/merge contract every built-in declarative aggregate
  * honors. Results are a sorted multiset — independent of partition
  * order, so cluster-deterministic.
  */
class TopKAggregate(k: Int)
    extends Aggregator[Double, Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.empty

  override def reduce(b: Array[Double], a: Double): Array[Double] =
    if (b.length < k) (b :+ a).sortBy(-_)
    else if (a > b.last) { b(k - 1) = a; b.sortBy(-_) }
    else b

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    (b1 ++ b2).sortBy(-_).take(k)

  override def finish(b: Array[Double]): Array[Double] = b

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object TopKAggregate {
  /** Column form, usable in any groupBy().agg(...). */
  def top_k(c: Column, k: Int): Column =
    udaf(new TopKAggregate(k),
      org.apache.spark.sql.Encoders.scalaDouble).apply(c)
}
