package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** File-format breadth + partition pruning — the scan-side properties
  * that decide whether a 100 TB table is read or skipped.
  */
class FileFormatsSpec extends SparkSpec {

  test("hive-partitioned write prunes partitions at scan time") {
    val tmp = Files.createTempDirectory("graft-part").toString
    val o = Tables.orders(spark, sf())
    o.write.partitionBy("o_orderstatus").parquet(s"$tmp/orders")

    val pruned = spark.read.parquet(s"$tmp/orders")
      .filter(col("o_orderstatus") === "F")
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    // the status predicate must land in PartitionFilters (directory
    // pruning), not in dataFilters (row-level post-read)
    assert(scan.partitionFilters.exists(_.toString.contains("o_orderstatus")))
    assert(!scan.dataFilters.exists(_.toString.contains("o_orderstatus")))
    assert(pruned.count() ==
      o.filter(col("o_orderstatus") === "F").count())
  }

  test("csv and json round-trip with explicit schemas") {
    val tmp = Files.createTempDirectory("graft-fmt").toString
    val n = Tables.nation(spark, sf())
    n.write.option("header", "true").csv(s"$tmp/nation_csv")
    n.write.json(s"$tmp/nation_json")

    val fromCsv = spark.read.option("header", "true").schema(n.schema)
      .csv(s"$tmp/nation_csv")
    val fromJson = spark.read.schema(n.schema).json(s"$tmp/nation_json")

    val expected = n.collect().map(_.toSeq).toSet
    assert(fromCsv.collect().map(_.toSeq).toSet == expected)
    assert(fromJson.collect().map(_.toSeq).toSet == expected)
  }
}
