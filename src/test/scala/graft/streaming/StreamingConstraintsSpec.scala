package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming DQ monitor: per-window violation counts, domain checks
  * via stream-static anti join, closed-window append semantics.
  */
class StreamingConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("violations are counted per window and per check") {
    implicit val sqlCtx = spark.sqlContext
    val valid = Seq("view", "click").toDF("et")
    val input = MemoryStream[(Timestamp, java.lang.Long, String, Double)]
    val out = StreamingConstraints.monitor(
      input.toDF().toDF("ts", "user_id", "event_type", "value"),
      valid, maxValue = 100.0)
    val q = out.writeStream.format("memory").queryName("dq_mon")
      .outputMode("append").start()
    try {
      input.addData(
        (ts(0, 10), Long.box(1L), "view", 5.0),     // clean
        (ts(0, 20), Long.box(2L), "zzz", 5.0),      // unknown type
        (ts(0, 30), Long.box(3L), "click", 500.0),  // out of range
        (ts(0, 40), Long.box(3L), "oops", -1.0),    // unknown type AND out of range
        (ts(0, 50), null, "view", 1.0),   // null user
        (ts(1, 10), Long.box(4L), "zzz", 1.0))      // unknown type, NEXT window
      q.processAllAvailable()
      // advance the watermark far enough to close both windows
      input.addData((ts(30), Long.box(9L), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("dq_mon")
        .as[(Timestamp, String, Long)].collect()
        .map { case (w, c, n) => (w.toString, c) -> n }.toMap
      val w0 = "2024-01-01 10:00:00.0"
      val w1 = "2024-01-01 10:01:00.0"
      assert(rows((w0, "unknown_event_type")) == 2L)
      assert(rows((w0, "value_out_of_range")) == 2L)
      assert(rows((w0, "null_user_id")) == 1L)
      assert(rows((w1, "unknown_event_type")) == 1L)
      assert(!rows.contains((w1, "value_out_of_range")))
    } finally q.stop()
  }

  test("a clean stream emits no violation rows") {
    implicit val sqlCtx = spark.sqlContext
    val valid = Seq("view", "click").toDF("et")
    val input = MemoryStream[(Timestamp, java.lang.Long, String, Double)]
    val out = StreamingConstraints.monitor(
      input.toDF().toDF("ts", "user_id", "event_type", "value"),
      valid, maxValue = 100.0)
    val q = out.writeStream.format("memory").queryName("dq_clean")
      .outputMode("append").start()
    try {
      input.addData((ts(0), Long.box(1L), "view", 5.0),
        (ts(1), Long.box(2L), "click", 6.0))
      q.processAllAvailable()
      input.addData((ts(30), Long.box(3L), "view", 1.0)) // close windows
      q.processAllAvailable()
      assert(spark.table("dq_clean").count() == 0L)
    } finally q.stop()
  }
}
