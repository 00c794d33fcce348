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

  test("range-clustered write yields disjoint per-file key ranges") {
    val tmp = Files.createTempDirectory("graft-cluster").toString
    val o = Tables.orders(spark, sf())
    Layout.writeClustered(o, col("o_custkey"), s"$tmp/orders", files = 4)
    // every output file must cover a non-overlapping o_custkey range —
    // the property parquet min/max stats need for file-level skipping
    val ranges = spark.read.parquet(s"$tmp/orders")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_custkey")).as("lo"), max(col("o_custkey")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping file ranges: $ranges")
    }
    assert(spark.read.parquet(s"$tmp/orders").count() == o.count())
  }

  test("z-ordered write prunes files on BOTH clustering columns") {
    val tmp = Files.createTempDirectory("graft-zorder").toString
    val o = Tables.orders(spark, sf())
    Layout.writeZOrdered(o, col("o_custkey"), col("o_totalprice"),
      s"$tmp/z", files = 16)
    // single-column control: clustered on custkey only
    Layout.writeClustered(o, col("o_custkey"), s"$tmp/c", files = 16)

    // per-file [min,max] envelopes for both columns
    def envelopes(path: String, c: String): Array[(Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min(col(c).cast("double")).as("lo"),
          max(col(c).cast("double")).as("hi"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))

    // fraction of files a point predicate must read, averaged over the
    // files' own midpoints (≈ how well min/max stats skip files)
    def matchFraction(env: Array[(Double, Double)]): Double = {
      val probes = env.map { case (lo, hi) => (lo + hi) / 2 }
      probes.map(p =>
        env.count { case (lo, hi) => lo <= p && p <= hi }.toDouble
          / env.length).sum / probes.length
    }

    val za = matchFraction(envelopes(s"$tmp/z", "o_custkey"))
    val zb = matchFraction(envelopes(s"$tmp/z", "o_totalprice"))
    val ca = matchFraction(envelopes(s"$tmp/c", "o_custkey"))
    val cb = matchFraction(envelopes(s"$tmp/c", "o_totalprice"))

    // z-order: a point predicate on EITHER column skips most files
    assert(za < 0.7, s"z-order custkey fraction $za")
    assert(zb < 0.7, s"z-order totalprice fraction $zb")
    // control: single-column clustering prunes its key but leaves the
    // second column unprunable (every file spans ~the full range)
    assert(ca < zb, s"control custkey $ca should beat z-order")
    assert(cb > 0.9, s"control totalprice fraction $cb should be ~1")
    // and the data itself round-trips
    assert(spark.read.parquet(s"$tmp/z").count() == o.count())
  }

  test("csv, json and orc round-trip with explicit schemas") {
    val tmp = Files.createTempDirectory("graft-fmt").toString
    val n = Tables.nation(spark, sf())
    n.write.option("header", "true").csv(s"$tmp/nation_csv")
    n.write.json(s"$tmp/nation_json")
    n.write.orc(s"$tmp/nation_orc")

    val fromCsv = spark.read.option("header", "true").schema(n.schema)
      .csv(s"$tmp/nation_csv")
    val fromJson = spark.read.schema(n.schema).json(s"$tmp/nation_json")
    val fromOrc = spark.read.orc(s"$tmp/nation_orc")

    val expected = n.collect().map(_.toSeq).toSet
    assert(fromCsv.collect().map(_.toSeq).toSet == expected)
    assert(fromJson.collect().map(_.toSeq).toSet == expected)
    assert(fromOrc.collect().map(_.toSeq).toSet == expected)
    // ORC, like parquet, is a pushdown-capable columnar source
    val pushed = fromOrc.filter(col("n_regionkey") === 1).select("n_name")
    assert(pushed.queryExecution.executedPlan.toString
      .contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,1)]"))
    assert(pushed.count() == n.filter(col("n_regionkey") === 1).count())
  }

  test("compaction rewrites a fragmented table to size-targeted files") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val o = Tables.orders(spark, sf())
    // fragment: one file per repartition slice, 64 tiny files
    o.repartition(64).write.parquet(s"$tmp/frag")
    val fragFiles = new java.io.File(s"$tmp/frag").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 64)

    // target ~ a quarter of the total bytes → 4 output files
    val totalBytes = new java.io.File(s"$tmp/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (nIn, nOut) = Layout.compact(spark, s"$tmp/frag",
      s"$tmp/compacted", targetBytes = totalBytes / 4 + 1)
    assert(nIn == 64)
    assert(nOut == 4)
    val outFiles = new java.io.File(s"$tmp/compacted").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == 4)
    // content survives byte-for-byte (same multiset of rows)
    val before = o.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val after = spark.read.parquet(s"$tmp/compacted")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(after == before)
    // original untouched — the caller owns the swap
    assert(new java.io.File(s"$tmp/frag").listFiles()
      .count(_.getName.endsWith(".parquet")) == 64)
  }
}
