package graft.cdc

import graft.SparkSpec
import graft.model.{ChangeEvent, TransactionRecord, TxnEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState (state API v2) implementation must match V1's
  * observable semantics. Requires the RocksDB state store provider.
  */
class StreamingReconstructionV2Spec extends SparkSpec {
  import spark.implicits._

  private def withRocks[T](body: => T): T = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf
      .unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("v2: events then END emit one time-ordered record; empty END emits nothing") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val changes = MemoryStream[ChangeEvent]
      val txns = MemoryStream[TxnEvent]
      val out = StreamingReconstructionV2.reconstruct(
        changes.toDS(), txns.toDS())
      val q = out.writeStream.format("memory").queryName("v2_out")
        .outputMode("append").start()
      try {
        changes.addData(
          ChangeEvent("t1", "u", 30L, None, None),
          ChangeEvent("t1", "c", 10L, None, None))
        q.processAllAvailable()
        changes.addData(ChangeEvent("t1", "u", 20L, None, None))
        txns.addData(TxnEvent("t1", "END", Some(3L)),
          TxnEvent("t2", "END", Some(0L))) // t2: nothing buffered
        q.processAllAvailable()
        val recs = spark.table("v2_out").as[TransactionRecord].collect()
        assert(recs.map(_.transactionId).toSeq == Seq("t1"))
        assert(recs.head.events.map(_.tsMs) == Seq(10L, 20L, 30L))
        assert(recs.head.eventCount.contains(3L))
      } finally q.stop()
    }
  }

  test("v2 matches v1 on a 50-txn shuffled corpus") {
    val rnd = new scala.util.Random(7)
    val txns = (0 until 50).map(i => s"x$i" -> (1 + rnd.nextInt(4)))
    val events = txns.flatMap { case (id, n) =>
      (0 until n).map(k =>
        ChangeEvent(id, "u", 1000L * (k + 1) + rnd.nextInt(999), None, None))
    }
    val ends = txns.map { case (id, n) => TxnEvent(id, "END", Some(n.toLong)) }
    val evBatches = rnd.shuffle(events).grouped(events.size / 3 + 1).toSeq
    val endBatches = rnd.shuffle(ends).grouped(ends.size / 3 + 1).toSeq

    def run(v2: Boolean, name: String): Map[String, TransactionRecord] =
      withRocks {
        implicit val sqlCtx = spark.sqlContext
        val c = MemoryStream[ChangeEvent]
        val t = MemoryStream[TxnEvent]
        val out =
          if (v2) StreamingReconstructionV2.reconstruct(c.toDS(), t.toDS(),
            countGated = true)
          else StreamingReconstruction.reconstruct(c.toDS(), t.toDS(),
            countGated = true)
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          evBatches.zipAll(endBatches, Nil, Nil).foreach { case (ev, en) =>
            if (ev.nonEmpty) c.addData(ev)
            if (en.nonEmpty) t.addData(en)
            q.processAllAvailable()
          }
          spark.table(name).as[TransactionRecord].collect()
            .map(r => r.transactionId -> r).toMap
        } finally q.stop()
      }

    val v1 = run(v2 = false, "eq_v1")
    val v2 = run(v2 = true, "eq_v2")
    assert(v1.keySet == v2.keySet && v1.size == 50)
    v1.foreach { case (id, r1) =>
      assert(v2(id).events.map(_.tsMs) == r1.events.map(_.tsMs))
      assert(v2(id).eventCount == r1.eventCount)
    }
  }

  /** TTL drive helper: TimeMode.ProcessingTime schedules batches
    * continuously (processAllAvailable never returns — same trap as
    * V1's ProcessingTimeTimeout), so TTL tests run bounded
    * Trigger.Once batches against a shared checkpoint, like the V1
    * TTL spec.
    */
  private def runOnce(out: org.apache.spark.sql.Dataset[TransactionRecord],
      tmp: String): Unit = {
    val q = out.writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q.awaitTermination()
  }

  test("v2 TTL: expired buffer is gone; fresh same-batch txn still emits") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val tmp = java.nio.file.Files.createTempDirectory("v2-ttl").toString
      val changes = MemoryStream[ChangeEvent]
      val txns = MemoryStream[TxnEvent]
      val out = StreamingReconstructionV2.reconstruct(
        changes.toDS(), txns.toDS(),
        ttl = Some(java.time.Duration.ofSeconds(1)))
      changes.addData(ChangeEvent("t1", "c", 1L, None, None))
      runOnce(out, tmp)               // t1 buffered, TTL armed
      Thread.sleep(2000)              // let t1's buffer expire
      changes.addData(ChangeEvent("t2", "c", 2L, None, None))
      txns.addData(TxnEvent("t1", "END", Some(1L)),
        TxnEvent("t2", "END", Some(1L)))
      runOnce(out, tmp)
      val recs = spark.read.parquet(s"$tmp/out")
        .as[TransactionRecord].collect()
      // t1's list state expired → END finds nothing → parity no-emit;
      // t2 is written in this same batch → alive → emits
      assert(recs.map(_.transactionId).toSeq == Seq("t2"))
    }
  }

  test("v2 TTL re-arms the WHOLE buffer on any activity (V1 semantics)") {
    // Without rewrite-on-touch, TTLConfig expires each list element
    // from its own write: a slow transaction spanning the TTL loses its
    // OLDER events and emits truncated. The re-arm rewrites the list on
    // every input, so expiry is from last activity, atomically.
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val tmp = java.nio.file.Files.createTempDirectory("v2-rearm").toString
      val changes = MemoryStream[ChangeEvent]
      val txns = MemoryStream[TxnEvent]
      // Margins sized for a loaded CI host: the touch batch has 8 s of
      // slack before e1's original expiry (a slower batch start must
      // not let e1 lapse BEFORE the rewrite), and the final batch runs
      // ≥2 s past the original expiry plus all inter-batch overhead
      // (overhead only pushes it further past, never flips it back).
      val out = StreamingReconstructionV2.reconstruct(
        changes.toDS(), txns.toDS(),
        ttl = Some(java.time.Duration.ofSeconds(18)))
      val t0 = System.currentTimeMillis() // earliest possible e1 write
      changes.addData(ChangeEvent("t1", "c", 100L, None, None))
      runOnce(out, tmp)               // e1 written at ~T0, expiry T0+18
      Thread.sleep(10000)
      changes.addData(ChangeEvent("t1", "u", 200L, None, None))
      runOnce(out, tmp)               // e2 + REWRITE of e1 → expiry reset
      // On an overloaded host the touch batch itself can slip past e1's
      // original expiry, making the scenario undefined — cancel (not
      // fail) rather than report a false regression.
      assume(System.currentTimeMillis() - t0 < 18000,
        "host too slow: touch batch missed the TTL window")
      Thread.sleep(10000)             // now ~T0+20: past e1's ORIGINAL expiry
      txns.addData(TxnEvent("t1", "END", Some(2L)))
      runOnce(out, tmp)
      val recs = spark.read.parquet(s"$tmp/out")
        .as[TransactionRecord].collect()
      assert(recs.map(_.transactionId).toSeq == Seq("t1"))
      // the older event survived because the touch re-armed it
      assert(recs.head.events.map(_.tsMs) == Seq(100L, 200L))
    }
  }

  test("v2 event-time timers evict never-ended state as the watermark advances") {
    // transformWithState counterpart of the V1 event-time spec: no
    // sleeps — eviction driven purely by the change-stream watermark.
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val changes = MemoryStream[ChangeEvent]
      val txns = MemoryStream[TxnEvent]
      val out = StreamingReconstructionV2.reconstructEventTime(
        changes.toDS(), txns.toDS(),
        watermarkDelay = java.time.Duration.ofMillis(500),
        evictionHorizon = java.time.Duration.ofSeconds(2))
      val q = out.writeStream.format("memory").queryName("v2_evict")
        .outputMode("append").start()
      try {
        changes.addData(ChangeEvent("t1", "c", 1000L, None, None),
          ChangeEvent("t1", "u", 1200L, None, None),
          ChangeEvent("t3", "c", 1100L, None, None))
        q.processAllAvailable()
        changes.addData(ChangeEvent("t2", "c", 60000L, None, None))
        txns.addData(TxnEvent("t3", "END", Some(1L)))
        q.processAllAvailable()        // t3 emits; watermark → 59_500
        changes.addData(ChangeEvent("t2", "u", 61000L, None, None))
        q.processAllAvailable()        // t1's timer (3200) fires → dropped
        txns.addData(TxnEvent("t1", "END", Some(2L)))
        q.processAllAvailable()        // late END finds nothing
        val recs = spark.table("v2_evict").as[TransactionRecord].collect()
        assert(recs.map(_.transactionId).toSeq == Seq("t3"))
      } finally q.stop()
    }
  }

  test("v2 event-time: END-first countGated txn survives the watermark (epoch ts)") {
    // Same regression as V1: marker-only buffers must get the full
    // horizon from the watermark, not watermark+1.
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val T = 1700000000000L
      val changes = MemoryStream[ChangeEvent]
      val txns = MemoryStream[TxnEvent]
      val out = StreamingReconstructionV2.reconstructEventTime(
        changes.toDS(), txns.toDS(), countGated = true,
        watermarkDelay = java.time.Duration.ofMillis(500),
        evictionHorizon = java.time.Duration.ofSeconds(60))
      val q = out.writeStream.format("memory").queryName("v2_endfirst")
        .outputMode("append").start()
      try {
        changes.addData(ChangeEvent("w", "c", T, None, None))
        q.processAllAvailable()
        txns.addData(TxnEvent("t1", "END", Some(2L)))
        changes.addData(ChangeEvent("w", "u", T + 1000, None, None))
        q.processAllAvailable()
        changes.addData(ChangeEvent("w", "u", T + 2000, None, None))
        q.processAllAvailable()
        changes.addData(ChangeEvent("t1", "c", T + 3000, None, None),
          ChangeEvent("t1", "u", T + 3100, None, None))
        q.processAllAvailable()
        val recs = spark.table("v2_endfirst").as[TransactionRecord].collect()
        assert(recs.map(_.transactionId).toSeq == Seq("t1"))
      } finally q.stop()
    }
  }

  test("v2 TTL: a BEGIN-only batch re-arms the END marker too") {
    // Regression: the re-arm condition skipped the END marker whenever
    // the batch contained any marker, so a BEGIN no-op let the END
    // expire mid-transaction and the final event found no marker.
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val tmp = java.nio.file.Files.createTempDirectory("v2-begin").toString
      val changes = MemoryStream[ChangeEvent]
      val txns = MemoryStream[TxnEvent]
      val out = StreamingReconstructionV2.reconstruct(
        changes.toDS(), txns.toDS(), countGated = true,
        ttl = Some(java.time.Duration.ofSeconds(12)))
      val t0 = System.currentTimeMillis() // earliest possible END write
      changes.addData(ChangeEvent("t1", "c", 100L, None, None))
      txns.addData(TxnEvent("t1", "END", Some(2L)))
      runOnce(out, tmp)               // 1 of 2 → held; END stored ~T0
      Thread.sleep(7000)
      txns.addData(TxnEvent("t1", "BEGIN", None))
      runOnce(out, tmp)               // BEGIN no-op must re-arm END too
      // cancel (not fail) if the BEGIN batch itself slipped past the
      // original expiry — the scenario is undefined on that slow a host
      assume(System.currentTimeMillis() - t0 < 12000,
        "host too slow: BEGIN batch missed the TTL window")
      Thread.sleep(7000)              // ~T0+14: past END's ORIGINAL expiry
      changes.addData(ChangeEvent("t1", "u", 200L, None, None))
      runOnce(out, tmp)               // 2 of 2 → emit
      val recs = spark.read.parquet(s"$tmp/out")
        .as[TransactionRecord].collect()
      assert(recs.map(_.transactionId).toSeq == Seq("t1"))
      assert(recs.head.events.map(_.tsMs) == Seq(100L, 200L))
    }
  }

  test("v2 countGated: holds until event_count met, either arrival order") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val changes = MemoryStream[ChangeEvent]
      val txns = MemoryStream[TxnEvent]
      val out = StreamingReconstructionV2.reconstruct(
        changes.toDS(), txns.toDS(), countGated = true)
      val q = out.writeStream.format("memory").queryName("v2_gated")
        .outputMode("append").start()
      try {
        txns.addData(TxnEvent("t9", "END", Some(2L))) // END first
        q.processAllAvailable()
        assert(spark.table("v2_gated").count() == 0) // 0 of 2 → hold
        changes.addData(ChangeEvent("t9", "c", 100L, None, None))
        q.processAllAvailable()
        assert(spark.table("v2_gated").count() == 0) // 1 of 2 → hold
        changes.addData(ChangeEvent("t9", "u", 200L, None, None))
        q.processAllAvailable()
        val recs = spark.table("v2_gated").as[TransactionRecord].collect()
        assert(recs.map(_.transactionId).toSeq == Seq("t9"))
        assert(recs.head.events.map(_.tsMs) == Seq(100L, 200L))
      } finally q.stop()
    }
  }
}
