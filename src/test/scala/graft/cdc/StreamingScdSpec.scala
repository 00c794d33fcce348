package graft.cdc

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.LatestState.EventRow

/** Streaming SCD2: intervals close on type change (across batches),
  * same-type repeats collapse, late rows are ignored.
  */
class StreamingScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("interval closes when the type changes across batches; repeats collapse; late rows ignored") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamingScd.closedIntervals(input.toDS())
      .writeStream.format("memory").queryName("scd_stream")
      .outputMode(StreamingScd.outputMode).start()
    try {
      // A@1, A@2: open interval, run-length collapse — nothing closed.
      input.addData(EventRow(10L, ts(1), 1L, "A", 1.0),
        EventRow(11L, ts(2), 1L, "A", 2.0))
      q.processAllAvailable()
      assert(spark.table("scd_stream").count() == 0)

      // B@3 closes A at ts(3); a stale A@0 must be ignored, not
      // reopen or corrupt the interval.
      input.addData(EventRow(12L, ts(3), 1L, "B", 3.0),
        EventRow(9L, ts(0), 1L, "A", 0.5))
      q.processAllAvailable()
      val closed = spark.table("scd_stream").collect()
      assert(closed.length == 1)
      assert(closed.head.getString(1) == "A")
      assert(closed.head.getTimestamp(2) == ts(1)) // valid_from = first A
      assert(closed.head.getTimestamp(3) == ts(3)) // valid_to = B's start

      // C@5 closes B; intervals tile: B runs [3, 5).
      input.addData(EventRow(13L, ts(5), 1L, "C", 4.0))
      q.processAllAvailable()
      val rows = spark.table("scd_stream").collect()
        .map(r => (r.getString(1), r.getTimestamp(2), r.getTimestamp(3)))
        .toSet
      assert(rows == Set(("A", ts(1), ts(3)), ("B", ts(3), ts(5))))
    } finally q.stop()
  }

  test("within-batch out-of-order rows are sorted before interval construction") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = StreamingScd.closedIntervals(input.toDS())
      .writeStream.format("memory").queryName("scd_stream2")
      .outputMode(StreamingScd.outputMode).start()
    try {
      // Arrival order B@3, A@1 — event-time order is A then B, so A's
      // interval [1, 3) must close, not a zero-length B artifact.
      input.addData(EventRow(21L, ts(3), 2L, "B", 1.0),
        EventRow(20L, ts(1), 2L, "A", 1.0))
      q.processAllAvailable()
      val closed = spark.table("scd_stream2").collect()
      assert(closed.length == 1)
      assert(closed.head.getString(1) == "A")
      assert(closed.head.getTimestamp(2) == ts(1))
      assert(closed.head.getTimestamp(3) == ts(3))
    } finally q.stop()
  }
}
