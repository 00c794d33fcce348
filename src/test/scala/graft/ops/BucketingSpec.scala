package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing — the co-located-join strategy for repeated large joins.
  *
  * At 100 TB, a fact⋈fact join that runs daily should not shuffle
  * either side every run: writing both tables bucketed (and sorted) by
  * the join key makes the join exchange-free — each task zips matching
  * buckets. This spec proves the plan property on real tables: the
  * bucketed join contains NO ShuffleExchangeExec, while the same join
  * on plain parquet shuffles both sides.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-partitioned join plans without a shuffle exchange") {
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    // Force a sort-merge path so the exchange question is meaningful
    // (a broadcast join has no exchange by construction).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.orders(spark, sf()).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/orders").saveAsTable("b_orders")
      Tables.customer(spark, sf()).write
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/customer").saveAsTable("b_customer")

      val bucketed = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plain = Tables.orders(spark, sf())
        .join(Tables.customer(spark, sf()),
          col("o_custkey") === col("c_custkey"))

      def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }.size

      assert(nExchanges(bucketed) == 0)
      assert(nExchanges(plain) == 2)
      // and the bucketed plan still returns the same row count
      assert(bucketed.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
