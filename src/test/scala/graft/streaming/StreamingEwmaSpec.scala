package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming EWMA parity: the full sf0.001 events corpus streamed in
  * three per-key-monotone micro-batches must score every event
  * EXACTLY as the batch `q_ewma` lag-chain window query — the two
  * share the scoring kernel, so any divergence is an ordering or
  * state bug, not float noise.
  */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  test("streamed corpus matches batch q_ewma bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[StreamingEwma.Ev]
      .collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    assert(rows.length > 500)

    val input = MemoryStream[StreamingEwma.Ev]
    val out = StreamingEwma.ewmaPerUser(input.toDF())
    val q = out.writeStream.format("memory").queryName("sewma")
      .outputMode("append").start()
    try {
      // global ts-order split => per-key monotone batches
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("sewma").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

      val batch = graft.ops.Operational.queries("q_ewma")(spark, sf())
        .select(col("user_id"), col("event_id"), col("ewma"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

      assert(streamed.size == rows.length && batch.size == rows.length)
      val diff = batch.collect {
        case (k, v) if streamed(k) != v => (k, v, streamed(k))
      }
      assert(diff.isEmpty, s"first mismatches: ${diff.take(3)}")
    } finally q.stop()
  }
}
