package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator plan must (a) appear in the physical
  * plan, (b) keep the single-Exchange shape of the window
  * formulation, (c) return exactly the window formulation's rows.
  */
class PartitionedTopKSpec extends SparkSpec {

  private def viaCustom = PartitionedTopK.topKPerKey(
    Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
    keys = Seq("o_custkey"),
    order = Seq("o_totalprice" -> false, "o_orderkey" -> true),
    k = 3)

  private def viaWindow = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
  }

  test("plans as PartitionedTopKExec with a single shuffle") {
    // string-level checks: AQE wraps the tree in AdaptiveSparkPlanExec,
    // which collect() does not descend into
    val plan = viaCustom.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionedTopK"), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("returns exactly the window formulation's rows") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val custom = rows(viaCustom)
    assert(custom == rows(viaWindow) && custom.nonEmpty)
  }

  test("k larger than any group degenerates to the identity") {
    val all = PartitionedTopK.topKPerKey(
      Tables.nation(spark, sf()),
      keys = Seq("n_regionkey"),
      order = Seq("n_nationkey" -> true),
      k = 1000)
    assert(all.count() == Tables.nation(spark, sf()).count())
  }
}
