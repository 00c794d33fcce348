package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salting must never change results — only how work is spread. */
class SkewSpec extends SparkSpec {

  test("saltedSum equals direct aggregation") {
    val o = Tables.orders(spark, sf())
    val direct = o.groupBy(col("o_custkey").as("k"))
      .agg(sum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    val salted = Skew.saltedSum(o, col("o_custkey"), col("o_totalprice"), 8)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    assert(salted.keySet == direct.keySet)
    // additive merge of doubles can differ in fold order — compare to 1e-6
    salted.foreach { case (k, (t, n)) =>
      assert(n == direct(k)._2 && math.abs(t - direct(k)._1) < 1e-6)
    }
  }

  test("saltedJoin equals plain join") {
    val o = Tables.orders(spark, sf())
    val c = Tables.customer(spark, sf())
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(o, c, "o_custkey", "c_custkey", 8)
      .select(col("o_orderkey"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
