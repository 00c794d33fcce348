package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming last-writer-wins snapshot semantics, incl. out-of-order
  * arrival (a late-but-older event must not regress the mirror).
  */
class LatestStateSpec extends SparkSpec {
  import spark.implicits._
  import LatestState.{EventRow, latest}

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("snapshot tracks the newest event; an older late arrival cannot regress it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = latest(input.toDS()).writeStream.format("memory")
      .queryName("snap").outputMode(LatestState.outputMode).start()
    try {
      input.addData(
        EventRow(10L, ts(1), 1L, "A", 1.0),
        EventRow(11L, ts(5), 1L, "B", 2.0))
      q.processAllAvailable()
      val afterB1 = spark.table("snap").collect()
      assert(afterB1.length == 1)
      assert(afterB1.head.getLong(1) == 11L) // newest of the batch wins

      // Batch 2: user 1 gets an OLDER event (out-of-order replay) and
      // user 2 appears for the first time.
      input.addData(
        EventRow(9L, ts(0), 1L, "stale", 0.0),
        EventRow(20L, ts(3), 2L, "C", 3.0))
      q.processAllAvailable()
      val rows = spark.table("snap").collect()
      // user 1 re-emitted its UNCHANGED snapshot (event 11), never the
      // stale event; user 2 emitted its first snapshot.
      assert(rows.count(r => r.getLong(0) == 1L && r.getLong(1) == 11L) == 2)
      assert(!rows.exists(_.getLong(1) == 9L))
      assert(rows.exists(r => r.getLong(0) == 2L && r.getLong(1) == 20L))
    } finally q.stop()
  }

  test("same-ts tie breaks by event_id (deterministic winner)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = latest(input.toDS()).writeStream.format("memory")
      .queryName("snap_tie").outputMode(LatestState.outputMode).start()
    try {
      input.addData(
        EventRow(31L, ts(1), 3L, "x", 1.0),
        EventRow(30L, ts(1), 3L, "y", 2.0))
      q.processAllAvailable()
      val r = spark.table("snap_tie").collect()
      assert(r.length == 1 && r.head.getLong(1) == 31L)
    } finally q.stop()
  }
}
