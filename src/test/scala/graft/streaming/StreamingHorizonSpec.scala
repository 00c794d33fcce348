package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Span-store parity: after streaming the sf0.001 events corpus in
  * three batches — including an overlapping replay and a shuffled
  * (out-of-order) batch — the per-user (first_day, last_day) store
  * equals the batch aggregation of the whole corpus, and
  * `Operational.kmIntervals` over the store equals the batch
  * Kaplan–Meier interval table row for row. The live churn-horizon
  * claim, pinned.
  */
class StreamingHorizonSpec extends SparkSpec {
  import spark.implicits._

  test("streamed user spans equal the batch frame; km intervals match") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(rows.length > 500)

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingHorizon.spans(
        input.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("user_spans")
      .outputMode("update").start()
    try {
      val third = (rows.length + 2) / 3
      // batch 1: first two thirds, reversed (out of order)
      input.addData(rows.take(2 * third).reverse.toIndexedSeq)
      q.processAllAvailable()
      // batch 2: overlapping replay of the middle third
      input.addData(rows.slice(third, 2 * third).toIndexedSeq)
      q.processAllAvailable()
      // batch 3: the tail
      input.addData(rows.drop(2 * third).toIndexedSeq)
      q.processAllAvailable()

      // Update mode re-emits per touched user: latest = widest span
      val streamed = spark.table("user_spans").collect()
        .groupBy(_.getLong(0))
        .map { case (uid, rs) =>
          uid -> (rs.map(_.getLong(1)).min, rs.map(_.getLong(2)).max)
        }

      val batchPerUser = rows.toSeq.toDF("user_id", "ts")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("fd"), max(col("day")).as("ld"))
      val batch = batchPerUser.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch)

      // The store, read through the factored interval derivation,
      // reproduces the batch Kaplan-Meier interval table exactly.
      val spansDf = streamed.toSeq
        .map { case (uid, (fd, ld)) => (uid, fd, ld) }
        .toDF("user_id", "fd", "ld")
      val fromStore = graft.ops.Operational
        .kmIntervals(spark, spansDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val fromBatch = graft.ops.Operational
        .kmIntervals(spark, batchPerUser).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(fromStore == fromBatch)
      assert(fromStore.nonEmpty)
      assert(fromStore.exists(_._2 > 0)) // someone is at risk
    } finally q.stop()
  }
}
