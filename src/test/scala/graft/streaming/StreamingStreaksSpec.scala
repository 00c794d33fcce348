package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming streak parity: the sf0.001 events corpus streamed in
  * three per-key-monotone micro-batches must leave every user's
  * (current, best) streak state equal to the batch gaps-and-islands
  * recompute — current = the LAST island's length, best = the max
  * island length.
  */
class StreamingStreaksSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-user streak state equals the batch islands") {
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"))
      .as[StreamingStreaks.Ev]
      .collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos))
    assert(rows.length > 500)

    val input = MemoryStream[StreamingStreaks.Ev]
    val out = StreamingStreaks.streaksPerUser(input.toDF())
    val q = out.writeStream.format("memory").queryName("sstreak")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // final state per user = the appended row with the newest
      // last_day (same-day re-emissions are identical rows)
      val streamed = spark.table("sstreak")
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("last_day"), col("cur_len"), col("best_len")),
          col("last_day")).as("s"))
        .select(col("user_id"), col("s.cur_len"), col("s.best_len"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap

      val expected = rows
        .map(e => (e.user_id, Math.floorDiv(e.ts.getTime, 86400000L)))
        .distinct
        .groupBy(_._1)
        .map { case (uid, ds) =>
          val days = ds.map(_._2).distinct.sorted
          // run-length scan over consecutive epoch days
          var lens = List.empty[Long]
          var run = 0L
          var prev = Long.MinValue
          days.foreach { d =>
            if (d == prev + 1) run += 1
            else { if (run > 0) lens ::= run; run = 1 }
            prev = d
          }
          lens ::= run
          uid -> (lens.head, lens.max)
        }

      assert(expected.nonEmpty)
      assert(streamed == expected,
        s"diff: ${(streamed.toSet diff expected.toSet).take(3)} / " +
          s"${(expected.toSet diff streamed.toSet).take(3)}")
    } finally q.stop()
  }
}
