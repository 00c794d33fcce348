package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming transition parity: the sf0.001 events corpus streamed in
  * three per-key-monotone micro-batches must emit exactly the
  * transition pairs the batch `q_transitions` lag window counts —
  * same session gap, same µs arithmetic, so the aggregated matrix is
  * identical.
  */
class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed transition counts equal the batch lag-window counts") {
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .as[StreamingTransitions.Ev]
      .collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    assert(rows.length > 500)

    val input = MemoryStream[StreamingTransitions.Ev]
    val out = StreamingTransitions.transitionsPerUser(input.toDF())
    val q = out.writeStream.format("memory").queryName("strans")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("strans")
        .groupBy(col("prev_type"), col("event_type"))
        .count()
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap

      val batch = graft.ops.Operational.queries("q_transitions")(spark, sf())
        .select(col("prev_type"), col("event_type"), col("c"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap

      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"diff: ${(streamed.toSet diff batch.toSet).take(3)} / " +
          s"${(batch.toSet diff streamed.toSet).take(3)}")
    } finally q.stop()
  }
}
