package graft.sources

import graft.SparkSpec
import graft.ingest.DebeziumParser
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Dead-letter split sink + RocksDB state store smoke. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("withDeadLetter splits parsed/malformed into separate parquet sinks") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-dlq").toString
    val input = MemoryStream[String]
    val parsed = DebeziumParser.parse(input.toDS().toDF("value"))
    val q = Sinks.withDeadLetter(parsed, s"$tmp/main", s"$tmp/dead",
      s"$tmp/ckpt").start()
    try {
      input.addData(
        """{"payload": {"op": "c", "ts_ms": 1, "transaction": {"id": "t"}, "before": null, "after": {}}}""",
        "garbage", """{"schema": {}}""")
      q.processAllAvailable()
      assert(spark.read.parquet(s"$tmp/main").count() == 1)
      val dead = spark.read.parquet(s"$tmp/dead")
        .select("value").as[String].collect().toSet
      assert(dead == Set("garbage", """{"schema": {}}"""))
    } finally q.stop()
  }

  test("RocksDB state store provider runs a stateful query") {
    val rocks = graft.GraftSession.builder(master = "local[2]",
        shufflePartitions = 2, rocksDbState = true)
      .getOrCreate()
    // The builder returns the existing session with the conf applied?
    // getOrCreate reuses the test session — set the conf explicitly for
    // this query instead and smoke a stateful aggregation through it.
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val out = graft.streaming.StreamOps.dedupWithinWatermark(
      input.toDF().toDF("ts", "k"), "ts", Seq("k"))
    val q = out.writeStream.format("memory").queryName("rocks_dedup")
      .outputMode("append").start()
    try {
      input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 1L))
      q.processAllAvailable()
      assert(rocks.table("rocks_dedup").count() == 1)
    } finally {
      q.stop()
      rocks.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
