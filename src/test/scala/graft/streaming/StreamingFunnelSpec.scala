package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming funnel parity: the sf0.001 events corpus streamed in
  * three per-key-monotone micro-batches must leave every user's final
  * funnel stage equal to the batch min-qualifying-timestamp recompute
  * (view → click-after-view → purchase-after-click).
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def us(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("streamed per-user funnel stage equals the batch recompute") {
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[StreamingFunnel.Ev]
      .collect()
      .sortBy(e => us(e.ts))
    assert(rows.length > 500)

    val input = MemoryStream[StreamingFunnel.Ev]
    val out = StreamingFunnel.funnelPerUser(input.toDF())
    val q = out.writeStream.format("memory").queryName("sfunnel")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // stages only move forward: final stage = max emitted
      val streamed = spark.table("sfunnel")
        .groupBy(col("user_id"))
        .agg(max(col("funnel_stage")).as("stage"))
        .collect()
        .map(r => r.getLong(0) -> r.getInt(1))
        .toMap

      val byUser = rows.groupBy(_.user_id)
      val expected = byUser.flatMap { case (uid, evs) =>
        val views = evs.filter(_.event_type == "view").map(e => us(e.ts))
        if (views.isEmpty) None
        else {
          val tv = views.min
          val clicks = evs.filter(e =>
            e.event_type == "click" && us(e.ts) > tv).map(e => us(e.ts))
          val stage =
            if (clicks.isEmpty) 1
            else {
              val tc = clicks.min
              val purchases = evs.filter(e =>
                e.event_type == "purchase" && us(e.ts) > tc)
              if (purchases.isEmpty) 2 else 3
            }
          Some(uid -> stage)
        }
      }

      assert(expected.nonEmpty)
      assert(streamed == expected,
        s"diff: ${(streamed.toSet diff expected.toSet).take(3)} / " +
          s"${(expected.toSet diff streamed.toSet).take(3)}")
    } finally q.stop()
  }
}
