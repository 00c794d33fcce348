package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Watermark/window semantics via MemoryStream. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window with watermark: late rows beyond delay are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val out = StreamOps.tumblingCounts(
      input.toDF().toDF("ts", "value"), "ts",
      watermarkDelay = "10 minutes", windowLen = "1 hour")
    val q = out.writeStream.format("memory").queryName("tumble")
      .outputMode("append").start()
    try {
      input.addData((ts(5), 1.0), (ts(30), 2.0), (ts(59), 3.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window
      input.addData((Timestamp.valueOf("2024-01-01 12:30:00"), 9.0))
      q.processAllAvailable()
      // this row is now older than watermark → dropped, not re-emitted
      input.addData((ts(10), 100.0))
      q.processAllAvailable()
      val rows = spark.table("tumble")
        .as[(Timestamp, Long, Double)].collect()
        .map { case (k, v, t) => (k.toString, (v, t)) }.toMap
      assert(rows("2024-01-01 10:00:00.0") == ((3L, 6.0)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops duplicate keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.dedupWithinWatermark(
      input.toDF().toDF("ts", "k"), "ts", Seq("k"),
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData((ts(1), 7L), (ts(2), 7L), (ts(3), 8L))
      q.processAllAvailable()
      input.addData((ts(4), 7L)) // still within watermark → duplicate
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("file streaming source: windowed agg over events parquet") {
    // The testable analog of the Kafka source: an unbounded file
    // source over the same parquet the batch queries read.
    val events = graft.Tables.events(spark, sf())
    val tmp = java.nio.file.Files.createTempDirectory("graft-fsrc")
    events.write.mode("overwrite").parquet(s"$tmp/events")
    val stream = spark.readStream.schema(events.schema)
      .parquet(s"$tmp/events")
    val out = StreamOps.tumblingCounts(stream, "ts",
      watermarkDelay = "1 minute", windowLen = "1 hour")
    val q = out.writeStream.format("memory").queryName("fsrc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val total = spark.table("fsrc")
        .agg(org.apache.spark.sql.functions.sum("n")).collect()
        .head.getLong(0)
      assert(total == events.count()) // every event landed in a window
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch from a table") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val dim = graft.Tables.nation(spark, sf())
    val out = StreamOps.staticEnrich(
      input.toDF().toDF("n_nationkey"), dim, Seq("n_nationkey"))
    val q = out.writeStream.format("memory").queryName("senrich")
      .outputMode("append").start()
    try {
      input.addData(0L, 1L, 9999L) // 9999 has no dim row → null name
      q.processAllAvailable()
      val rows = spark.table("senrich").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows(0L).isDefined && rows(1L).isDefined && rows(9999L).isEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join matches only rows within the bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.intervalJoin(
      clicks.toDF().toDF("c_ts", "c_user"),
      buys.toDF().toDF("b_ts", "b_user"),
      "c_user", "b_user", "c_ts", "b_ts", bound = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      // user 1: buy 5 min after click → within bound, joins.
      // user 2: click at 10:00, buy at 10:45 → outside ±10 min, dropped.
      clicks.addData((ts(0), 1L), (ts(0), 2L))
      buys.addData((ts(5), 1L), (ts(45), 2L))
      q.processAllAvailable()
      val rows = spark.table("ivj").as[(Timestamp, Long, Timestamp, Long)]
        .collect()
      assert(rows.map(_._2).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("Trigger.AvailableNow: incremental-batch catchup then stop") {
    // The "run as a batch job over whatever is new" operating mode —
    // processes all available source data, commits, terminates.
    val events = graft.Tables.events(spark, sf())
    val tmp = java.nio.file.Files.createTempDirectory("graft-avnow")
    events.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$tmp/in")
    val q = StreamOps.tumblingCounts(stream, "ts",
        watermarkDelay = "1 minute", windowLen = "1 hour")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination() // self-terminates once caught up
    // append output holds only watermark-closed windows; all but the
    // final in-flight window must have been flushed
    val flushed = spark.read.parquet(s"$tmp/out")
      .agg(org.apache.spark.sql.functions.sum("n")).collect()
      .head.getLong(0)
    assert(flushed > 0 && flushed <= events.count())
  }

  test("left-outer interval join null-pads once the watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.intervalJoin(
      clicks.toDF().toDF("c_ts", "c_user"),
      buys.toDF().toDF("b_ts", "b_user"),
      "c_user", "b_user", "c_ts", "b_ts",
      bound = "10 minutes", joinType = "left_outer")
    val q = out.writeStream.format("memory").queryName("ivj_outer")
      .outputMode("append").start()
    try {
      clicks.addData((ts(0), 1L), (ts(0), 2L)) // u1 will match, u2 won't
      buys.addData((ts(5), 1L))
      q.processAllAvailable()
      // push both watermarks far past u2's join window
      clicks.addData((Timestamp.valueOf("2024-01-01 13:00:00"), 777L))
      buys.addData((Timestamp.valueOf("2024-01-01 13:00:00"), 888L))
      q.processAllAvailable()
      val byUser = spark.table("ivj_outer")
        .as[(Timestamp, Long, Option[Timestamp], Option[Long])]
        .collect().map(r => r._2 -> r._4).toMap
      assert(byUser(1L).contains(1L))  // matched within bound
      assert(byUser(2L).isEmpty)       // emitted null-padded after close
    } finally q.stop()
  }

  test("session window groups by gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamOps.sessionCounts(
      input.toDF().toDF("ts", "user"), "ts", "user", gap = "5 minutes")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // two bursts 30 min apart → two sessions once watermark passes
      input.addData((ts(0), "u"), (ts(2), "u"), (ts(40), "u"))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "u"))
      q.processAllAvailable()
      val sessions = spark.table("sess").collect()
      assert(sessions.count(_.getString(0) == "u") >= 2)
    } finally q.stop()
  }

  test("streamed corpus sessionizes exactly like batch q_sessionize") {
    // Parity between the two independent sessionization mechanisms:
    // the batch lag+running-sum gap detector (q_sessionize) and the
    // streaming session_window state merge. Same 30-minute gap; the
    // only semantic difference is the exactly-at-gap boundary (batch
    // `> gap` keeps, session_window's half-open interval splits),
    // which microsecond-resolution data never hits — asserted
    // identical per (user, session): start, event count, and
    // end = last event + gap.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val batch = graft.SparkEntry.queries("q_sessionize")(spark, sf())
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("session_end"))
      .collect()
      .map { r =>
        // +30 min preserves the sub-second part; carry the original
        // nanos so microsecond timestamps compare exactly
        val last = r.getTimestamp(3)
        val end = new Timestamp(last.getTime + 30L * 60 * 1000)
        end.setNanos(last.getNanos)
        (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(2), end)
      }
      .toMap

    // deliver in event-time order so the 1-minute watermark never
    // drops a row (arrival order is the harness's choice; the batch
    // twin has no notion of lateness)
    val rows = graft.Tables.events(spark, sf())
      .select(col("ts"), col("user_id"))
      .as[(Timestamp, Long)].collect().toSeq
      .sortBy(_._1.getTime)
    val input = MemoryStream[(Timestamp, Long)]
    val out = StreamOps.sessionCounts(
      input.toDF().toDF("ts", "user_id"), "ts", "user_id",
      gap = "30 minutes", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      // close every open session
      input.addData((Timestamp.valueOf("2030-01-01 00:00:00"), -1L))
      q.processAllAvailable()
      val streamed = spark.table("sess_parity")
        .filter(col("user_id") =!= -1L)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)) ->
          (r.getLong(3), r.getTimestamp(2)))
        .toMap
      assert(streamed.size == batch.size,
        s"session count ${streamed.size} != batch ${batch.size}")
      streamed.foreach { case (k, v) =>
        assert(batch(k) == v, s"session $k: streamed $v vs batch ${batch(k)}")
      }
    } finally q.stop()
  }
}
