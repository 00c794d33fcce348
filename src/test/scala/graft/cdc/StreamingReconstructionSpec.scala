package graft.cdc

import graft.SparkSpec
import graft.model.TransactionRecord
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-semantics spec via MemoryStream — the Spark-native
  * replacement for Flink's operator test harness (SURVEY.md §5).
  *
  * Covers both arrival orders (the stricter of the two reference
  * pipelines' behaviors), BEGIN no-ops, empty-END, and count-gating.
  */
class StreamingReconstructionSpec extends SparkSpec {
  import spark.implicits._

  private def change(txn: String, ts: Long, op: String = "u"): String =
    s"""{"payload": {"op": "$op", "ts_ms": $ts,
       |  "transaction": {"id": "$txn"},
       |  "before": {"v": ${ts - 1}}, "after": {"v": $ts}}}""".stripMargin
  private def marker(txn: String, status: String, count: Long = -1): String = {
    val c = if (count >= 0) count.toString else "null"
    s"""{"payload": {"status": "$status", "id": "$txn", "event_count": $c}}"""
  }

  /** Drive a scenario: feed batches into a MemoryStream, return all
    * emitted records after each batch is fully processed.
    */
  private def run(countGated: Boolean, batches: Seq[Seq[String]],
      name: String): Seq[TransactionRecord] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingReconstruction.fromRawStrings(input.toDS(), countGated)
    val query: StreamingQuery = out.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
      spark.table(name).as[TransactionRecord].collect().toSeq
    } finally query.stop()
  }

  test("events then END: one record with all events, time-ordered") {
    val recs = run(countGated = false, Seq(
      Seq(change("t1", 30), change("t1", 10), marker("t1", "BEGIN")),
      Seq(change("t1", 20), marker("t1", "END", 3))
    ), "s1")
    assert(recs.map(_.transactionId) == Seq("t1"))
    assert(recs.head.events.map(_.tsMs) == Seq(10, 20, 30))
    assert(recs.head.eventCount.contains(3L))
  }

  test("parity mode: END emits whatever is buffered; empty END emits nothing") {
    val recs = run(countGated = false, Seq(
      Seq(change("t1", 1), change("t1", 2)),
      Seq(marker("t1", "END", 5)), // short: only 2 of 5 arrived
      Seq(marker("t2", "END", 0))  // nothing buffered for t2
    ), "s2")
    assert(recs.map(_.transactionId) == Seq("t1"))
    assert(recs.head.events.size == 2) // reference parity: emit short
  }

  test("countGated mode: END before stragglers holds until count met") {
    val recs1 = run(countGated = true, Seq(
      Seq(change("t1", 1), marker("t1", "END", 3)), // 1 of 3 — hold
      Seq(change("t1", 2)),                         // 2 of 3 — hold
      Seq(change("t1", 3))                          // 3 of 3 — emit
    ), "s3")
    assert(recs1.map(_.transactionId) == Seq("t1"))
    assert(recs1.head.events.map(_.tsMs) == Seq(1, 2, 3))
  }

  test("metadata before any event (pipeline-2 race): no data loss") {
    // The reference's pipeline 2 drops change events whose metadata
    // hasn't arrived (`...WithEventCorrelation.java:146-149`). With
    // count-gating the transaction emits complete regardless of order.
    val recs = run(countGated = true, Seq(
      Seq(marker("t9", "BEGIN"), marker("t9", "END", 2)),
      Seq(change("t9", 100), change("t9", 200))
    ), "s4")
    assert(recs.map(_.transactionId) == Seq("t9"))
    assert(recs.head.events.map(_.tsMs) == Seq(100, 200))
  }

  test("streaming output matches batch assembly on a 50-txn shuffled corpus") {
    val rnd = new scala.util.Random(42)
    val txns = (0 until 50).map(i => s"txn$i" -> (1 + rnd.nextInt(5)))
    val events = txns.flatMap { case (id, n) =>
      (0 until n).map(k => change(id, 1000L * (k + 1) + rnd.nextInt(999)))
    }
    val ends = txns.map { case (id, n) => marker(id, "END", n) }
    val all = rnd.shuffle(events ++ ends)
    val batches = all.grouped((all.size / 3) + 1).toSeq
    val recs = run(countGated = true, batches, "s_corpus")
    assert(recs.size == 50)
    val byId = recs.map(r => r.transactionId -> r).toMap
    txns.foreach { case (id, n) =>
      assert(byId(id).events.size == n)
      assert(byId(id).eventCount.contains(n.toLong))
      val ts = byId(id).events.map(_.tsMs)
      assert(ts == ts.sorted) // deterministic event-time order
    }
  }

  test("BEGIN alone emits nothing; independent txns don't interfere") {
    val recs = run(countGated = false, Seq(
      Seq(marker("a", "BEGIN"), change("a", 1), change("b", 1)),
      Seq(marker("b", "END", 1))
    ), "s5")
    assert(recs.map(_.transactionId) == Seq("b"))
  }

  test("event-time horizon evicts never-ended state as the watermark advances") {
    // Replay-safe leak fix: eviction is driven by EVENT time (the
    // change-stream watermark), not wall clock — no sleeps anywhere in
    // this test. t1 buffers events but never ENDs; later traffic on
    // other keys advances the watermark past t1's newest event +
    // horizon, the timer fires, and a late END for t1 then finds no
    // state (emits nothing). t3, which ENDs within the horizon, emits.
    implicit val sqlCtx = spark.sqlContext
    import graft.model.{ChangeEvent, TxnEvent}
    val changes = MemoryStream[ChangeEvent]
    val txns = MemoryStream[TxnEvent]
    val out = StreamingReconstruction.reconstructEventTime(
      changes.toDS(), txns.toDS(),
      watermarkDelay = java.time.Duration.ofMillis(500),
      evictionHorizon = java.time.Duration.ofSeconds(2))
    val q = out.writeStream.format("memory").queryName("s_evict")
      .outputMode("append").start()
    try {
      // batch 1: t1 buffers at ts 1000/1200; t3 buffers at ts 1100
      changes.addData(ChangeEvent("t1", "c", 1000L, None, None),
        ChangeEvent("t1", "u", 1200L, None, None),
        ChangeEvent("t3", "c", 1100L, None, None))
      q.processAllAvailable()
      // batch 2: t3 ENDs inside the horizon → emits (positive control);
      // unrelated t2 traffic at ts 60_000 advances the watermark
      changes.addData(ChangeEvent("t2", "c", 60000L, None, None))
      txns.addData(TxnEvent("t3", "END", Some(1L)))
      q.processAllAvailable()
      // batch 3: watermark entering this batch is 59_500 > t1's
      // 1200 + 2000 → t1's timer fires, state dropped
      changes.addData(ChangeEvent("t2", "u", 61000L, None, None))
      q.processAllAvailable()
      // batch 4: late END for t1 finds no state → nothing emitted
      txns.addData(TxnEvent("t1", "END", Some(2L)))
      q.processAllAvailable()
      val recs = spark.table("s_evict").as[TransactionRecord].collect()
      assert(recs.map(_.transactionId).toSeq == Seq("t3"))
    } finally q.stop()
  }

  test("event-time: END-first countGated txn survives until events arrive (epoch ts)") {
    // Regression: a marker-only buffer has no event time; its timeout
    // was clamped to watermark+1 (maxTs=0 << realistic watermarks), so
    // a buffered END was evicted on the very next watermark advance.
    // Fixed: marker-only buffers get the full horizon from the current
    // watermark.
    implicit val sqlCtx = spark.sqlContext
    import graft.model.{ChangeEvent, TxnEvent}
    val T = 1700000000000L // realistic epoch millis
    val changes = MemoryStream[ChangeEvent]
    val txns = MemoryStream[TxnEvent]
    val out = StreamingReconstruction.reconstructEventTime(
      changes.toDS(), txns.toDS(), countGated = true,
      watermarkDelay = java.time.Duration.ofMillis(500),
      evictionHorizon = java.time.Duration.ofSeconds(60))
    val q = out.writeStream.format("memory").queryName("s_endfirst")
      .outputMode("append").start()
    try {
      changes.addData(ChangeEvent("w", "c", T, None, None))
      q.processAllAvailable()                    // watermark ≈ T - 500
      txns.addData(TxnEvent("t1", "END", Some(2L)))
      changes.addData(ChangeEvent("w", "u", T + 1000, None, None))
      q.processAllAvailable()                    // t1 buffers END only
      changes.addData(ChangeEvent("w", "u", T + 2000, None, None))
      q.processAllAvailable()                    // watermark advances — t1 must survive
      changes.addData(ChangeEvent("t1", "c", T + 3000, None, None),
        ChangeEvent("t1", "u", T + 3100, None, None))
      q.processAllAvailable()                    // 2 of 2 → emit
      val recs = spark.table("s_endfirst").as[TransactionRecord].collect()
      assert(recs.map(_.transactionId).toSeq == Seq("t1"))
      assert(recs.head.events.map(_.tsMs) == Seq(T + 3000, T + 3100))
    } finally q.stop()
  }

  test("processing-time TTL evicts never-ended state across checkpoint restarts") {
    // The reference leaks state forever for transactions that never see
    // END (`DebeziumTransactionReconstructor.java:138`, no timer). With
    // ttl=Some(...) the timeout branch removes the buffer; a later END
    // then finds nothing and emits nothing. Driven with Trigger.Once
    // (exactly one micro-batch per run) + a shared checkpoint:
    // ProcessingTimeTimeout schedules timeout-check batches FOREVER
    // under both processAllAvailable and Trigger.AvailableNow, so a
    // bounded-batch trigger is the only way to test it. This also
    // exercises the reference's operational envelope: checkpointed
    // restart (O1/O2).
    implicit val sqlCtx = spark.sqlContext
    import graft.model.{ChangeEvent, TxnEvent}
    val tmp = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    val changes = MemoryStream[ChangeEvent]
    val txns = MemoryStream[TxnEvent]
    val out = StreamingReconstruction.reconstruct(
      changes.toDS(), txns.toDS(),
      ttl = Some(java.time.Duration.ofMillis(300)))

    def runOnce(): Unit = {
      val q = out.writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }

    changes.addData(ChangeEvent("t1", "c", 1L, None, None))
    runOnce()                       // t1 buffered, timer armed
    Thread.sleep(800)               // let t1's TTL expire
    changes.addData(ChangeEvent("t2", "c", 2L, None, None))
    runOnce()                       // batch runs → t1's timer fires → state dropped
    // Both ENDs arrive in ONE batch: t1's buffer is gone (TTL) → no
    // emit; t2 has data in this batch, so its group is processed as
    // data (expired timers are superseded by input) → emits complete.
    txns.addData(TxnEvent("t1", "END", Some(1L)),
      TxnEvent("t2", "END", Some(1L)))
    runOnce()
    val after = spark.read.parquet(s"$tmp/out")
    assert(after.count() == 1L)
    assert(after.select("transactionId").collect().head.getString(0) == "t2")
  }
}
