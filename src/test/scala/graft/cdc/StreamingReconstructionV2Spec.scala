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
