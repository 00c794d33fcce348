package graft.cdc

import graft.model._
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Transaction reconstruction on Spark 4's arbitrary-state API v2
  * (`transformWithState` / `StatefulProcessor`) — the modern successor
  * to [[StreamingReconstruction]]'s `flatMapGroupsWithState`, with the
  * same observable semantics (same fixture outputs, see
  * `StreamingReconstructionSpec`).
  *
  * What v2 buys at scale, vs the single-blob `GroupState`:
  *  - **Typed composite state**: the event buffer is a native
  *    `ListState` (RocksDB-backed appends — no read-modify-write of
  *    the whole buffer per event) and the END marker a separate
  *    `ValueState`, so appending to a large transaction no longer
  *    deserializes/reserializes its entire event list.
  *  - **Declarative TTL**: `TTLConfig` evicts never-ended
  *    transactions in the state store itself (the reference's state
  *    leak, `DebeziumTransactionReconstructor.java:138`, fixed without
  *    hand-rolled timers).
  *
  * Requires the RocksDB state store provider (Spark's requirement for
  * transformWithState), which is the 100 TB configuration anyway
  * (`GraftSession(rocksDbState = true)`).
  */
object StreamingReconstructionV2 {

  private class TxnProcessor(countGated: Boolean, ttl: TTLConfig,
      ttlArmed: Boolean)
      extends StatefulProcessor[String, UnionEvent, TransactionRecord] {

    @transient private var events: ListState[ChangeEvent] = _
    @transient private var endMarker: ValueState[TxnEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      events = getHandle.getListState[ChangeEvent](
        "events", Encoders.product[ChangeEvent], ttl)
      endMarker = getHandle.getValueState[TxnEvent](
        "end", Encoders.product[TxnEvent], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[UnionEvent],
        timers: TimerValues): Iterator[TransactionRecord] = {
      // Same deterministic choice as V1: change events (in event-time
      // order) before boundary markers within a batch.
      val (changes, markers) = rows.toList.partition(_.isChange)
      val newEvents = changes
        .map(u => ChangeEvent(u.transactionId, u.operation.getOrElse(""),
          u.tsMs.getOrElse(0L), u.before, u.after))
        .sortBy(_.tsMs)
      val endNow = markers.find(_.status.contains("END"))
      if (ttlArmed) {
        // TTLConfig expires each ListState element from its own last
        // write, whereas V1's timeout resets on ANY activity and drops
        // the whole buffer atomically. Re-arm on every input by
        // rewriting the surviving list (and re-writing the END marker
        // unless this batch supplies a fresh one — a BEGIN-only batch
        // must still re-arm it), so the transaction expires as a unit
        // from its last activity — V1 semantics, at the cost of the
        // append-only write path (only paid when a TTL is armed).
        val kept = events.get().toList
        events.clear()
        (kept ++ newEvents).foreach(events.appendValue)
        if (endNow.isEmpty && endMarker.exists())
          endMarker.update(endMarker.get())
      } else {
        newEvents.foreach(events.appendValue)
      }
      endNow.foreach { m =>
        endMarker.update(TxnEvent(m.transactionId, "END", m.eventCount))
      }

      StreamingReconstructionV2.emitIfComplete(
        key, events, endMarker, countGated)
    }
  }

  /** V2 on event-time timers — the transformWithState counterpart of
    * [[StreamingReconstruction.reconstructEventTime]]: a never-ended
    * transaction's state is dropped by an explicit timer at (newest
    * buffered event + horizon), driven by the change-stream watermark.
    * Same watermark/union construction and the same txn-marker design
    * decision (NULL event time) as V1. One timer per key: re-arming
    * deletes the previous registration.
    */
  private class TxnProcessorEventTime(countGated: Boolean, horizonMs: Long)
      extends StatefulProcessor[String, UnionEvent, TransactionRecord] {

    @transient private var events: ListState[ChangeEvent] = _
    @transient private var endMarker: ValueState[TxnEvent] = _
    @transient private var armedTimer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      events = getHandle.getListState[ChangeEvent](
        "events", Encoders.product[ChangeEvent], TTLConfig.NONE)
      endMarker = getHandle.getValueState[TxnEvent](
        "end", Encoders.product[TxnEvent], TTLConfig.NONE)
      armedTimer = getHandle.getValueState[Long](
        "timer", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def disarm(): Unit = {
      if (armedTimer.exists()) getHandle.deleteTimer(armedTimer.get())
      armedTimer.clear()
    }

    override def handleInputRows(key: String, rows: Iterator[UnionEvent],
        timers: TimerValues): Iterator[TransactionRecord] = {
      val (changes, markers) = rows.toList.partition(_.isChange)
      changes
        .map(u => ChangeEvent(u.transactionId, u.operation.getOrElse(""),
          u.tsMs.getOrElse(0L), u.before, u.after))
        .sortBy(_.tsMs)
        .foreach(events.appendValue)
      markers.find(_.status.contains("END")).foreach { m =>
        endMarker.update(TxnEvent(m.transactionId, "END", m.eventCount))
      }
      val out = StreamingReconstructionV2.emitIfComplete(
        key, events, endMarker, countGated)
      disarm()
      if (events.exists() || endMarker.exists()) {
        // still buffering: evict at newest event + horizon; a
        // marker-only buffer has no event time and gets the full
        // horizon from the current watermark (wm + 1 would evict an
        // END-first transaction on the next watermark advance)
        val wm = timers.getCurrentWatermarkInMs()
        val buffered = events.get().toList
        val base =
          if (buffered.nonEmpty)
            buffered.foldLeft(0L)((m, e) => math.max(m, e.tsMs)) + horizonMs
          else wm + horizonMs
        val at = math.max(base, wm + 1)
        getHandle.registerTimer(at)
        armedTimer.update(at)
      }
      out
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[TransactionRecord] = {
      // Replay-safe leak fix: watermark passed the horizon, END never
      // came — drop the whole buffer.
      events.clear(); endMarker.clear(); armedTimer.clear()
      Iterator.empty
    }
  }

  /** Shared emit decision: END + complete buffer → emit and clear.
    * Used by both the TTL and the event-time-timer processors.
    */
  private def emitIfComplete(
      key: String,
      events: ListState[ChangeEvent],
      endMarker: ValueState[TxnEvent],
      countGated: Boolean): Iterator[TransactionRecord] = {
    if (!endMarker.exists()) Iterator.empty
    else {
      val end = endMarker.get()
      val buffered = events.get().toList
      val complete = !countGated ||
        end.eventCount.forall(_ <= buffered.size)
      if (buffered.isEmpty && !countGated) {
        // Parity: END with nothing buffered → no emit (`:159-163`).
        events.clear(); endMarker.clear()
        Iterator.empty
      } else if (complete) {
        events.clear(); endMarker.clear()
        Iterator.single(TransactionRecord(
          key, buffered.sortBy(_.tsMs), "END", end.eventCount))
      } else Iterator.empty
    }
  }

  /** Event-time variant — see [[TxnProcessorEventTime]]. */
  def reconstructEventTime(
      changes: Dataset[ChangeEvent],
      txns: Dataset[TxnEvent],
      countGated: Boolean = false,
      watermarkDelay: java.time.Duration = java.time.Duration.ofMinutes(1),
      evictionHorizon: java.time.Duration = java.time.Duration.ofMinutes(5))
      : Dataset[TransactionRecord] = {
    val spark = changes.sparkSession
    import spark.implicits._
    StreamingReconstruction
      .unionWithEventTime(changes, txns, watermarkDelay)
      .groupByKey(_.transactionId)
      .transformWithState(
        new TxnProcessorEventTime(countGated, evictionHorizon.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Same contract as [[StreamingReconstruction.reconstruct]]. */
  def reconstruct(
      changes: Dataset[ChangeEvent],
      txns: Dataset[TxnEvent],
      countGated: Boolean = false,
      ttl: Option[java.time.Duration] = None): Dataset[TransactionRecord] = {
    val spark = changes.sparkSession
    import spark.implicits._
    val ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    // TTLConfig requires TimeMode.ProcessingTime
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime()
                   else TimeMode.None()
    changes.map(UnionEvent.fromChange)
      .union(txns.map(UnionEvent.fromTxn))
      .groupByKey(_.transactionId)
      .transformWithState(
        new TxnProcessor(countGated, ttlConf, ttlArmed = ttl.isDefined),
        timeMode, OutputMode.Append())
  }
}
