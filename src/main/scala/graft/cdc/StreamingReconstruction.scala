package graft.cdc

import graft.model._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transaction reconstruction — the Spark-native form of the
  * reference's `KeyedCoProcessFunction` (`TransactionReconstructor`,
  * `DebeziumTransactionReconstructor.java:131-170`).
  *
  * Spark has no two-input keyed stateful operator, so both streams are
  * unioned into one tagged envelope and grouped once on the
  * transaction id (SURVEY.md §2.1 J1). The single `GroupState` per key
  * subsumes the reference's `ValueState` (pipeline 1) and `MapState`
  * (pipeline 2's enrichment cache) — Spark state is inherently per-key
  * after `groupByKey`.
  *
  * Deliberate fixes over the reference, both documented in SURVEY.md
  * §7.5:
  *  - **No state leak**: the reference never clears state for
  *    transactions that never see END (`:138`, no timer). Here every
  *    state carries a processing-time TTL and is dropped on timeout.
  *  - **No arrival-order races**: pipeline 2 drops change events whose
  *    metadata hasn't arrived (`...WithEventCorrelation.java:146-149`).
  *    Here events buffer in state regardless of arrival order; END seen
  *    before stragglers can optionally wait for `event_count` events
  *    (`countGated = true`) instead of emitting short.
  *
  * Scale: one hash exchange on the transaction id feeding
  * `FlatMapGroupsWithStateExec`; state lives in the state store
  * (RocksDB provider for large deployments — see GraftSession). Buffered
  * events per transaction are bounded by transaction size, the same
  * memory shape as the reference's `ValueState<TransactionState>`.
  */
object StreamingReconstruction {

  /** Per-key accumulator: buffered change events + whether END was seen
    * (only used when `countGated`). ≈ `TransactionState.java:6-21`.
    */
  case class TxnBuf(
      events: List[ChangeEvent],
      endSeen: Boolean,
      endStatus: Option[String],
      eventCount: Option[Long])

  object TxnBuf {
    val empty: TxnBuf = TxnBuf(Nil, endSeen = false, None, None)
  }

  /** One micro-batch of one key applied to state: buffer changes,
    * record END, emit when complete. Shared by the processing-time and
    * event-time variants; the caller arms the timeout afterwards if
    * `state.exists` (still buffering).
    */
  private def applyBatch(
      txnId: String,
      batch: Iterator[UnionEvent],
      state: GroupState[TxnBuf],
      countGated: Boolean): Iterator[TransactionRecord] = {
    // Within a micro-batch, apply change events (in event-time order)
    // before boundary markers — a deterministic choice where the
    // reference depends on thread arrival order.
    val (changeEvts, txnEvts) = batch.toList.partition(_.isChange)
    var buf = state.getOption.getOrElse(TxnBuf.empty)
    val newEvents = changeEvts
      .map(u => ChangeEvent(u.transactionId, u.operation.getOrElse(""),
        u.tsMs.getOrElse(0L), u.before, u.after))
      .sortBy(_.tsMs)
    buf = buf.copy(events = buf.events ++ newEvents)

    val endNow = txnEvts.find(_.status.contains("END"))
    if (endNow.isDefined)
      buf = buf.copy(endSeen = true, endStatus = Some("END"),
        eventCount = endNow.flatMap(_.eventCount))
    // BEGIN markers are no-ops, as in the reference (`:165-168`).

    def complete: Boolean = buf.endSeen && (
      !countGated ||
        buf.eventCount.forall(_ <= buf.events.size))

    if (buf.endSeen && buf.events.isEmpty && !countGated) {
      // Parity: END with nothing buffered → no emit (`:159-163`).
      state.remove()
      Iterator.empty
    } else if (complete) {
      state.remove()
      Iterator.single(TransactionRecord(
        txnId,
        buf.events.sortBy(_.tsMs),
        buf.endStatus.getOrElse("END"),
        buf.eventCount))
    } else {
      state.update(buf)
      Iterator.empty
    }
  }

  /** Reconstruct from the two typed streams.
    *
    * @param countGated if true, an END marker with a known
    *        `event_count` larger than the buffered size holds the
    *        transaction open until the count is met (fixes the
    *        reference's race); if false (default), parity with the
    *        reference: emit on END with whatever is buffered
    *        (`:156-169`), and END with an empty buffer emits nothing
    *        (`:159-163`).
    * @param ttl processing-time state TTL for never-ended transactions.
    *        `Some(d)` arms the leak fix (live-ingest default; for
    *        replay/backfill use [[reconstructEventTime]], whose
    *        eviction clock is event time); `None` disables timeouts
    *        entirely — required when driving the query with
    *        `processAllAvailable()` in tests, because
    *        ProcessingTimeTimeout makes Spark schedule timeout-check
    *        micro-batches continuously and the query never quiesces.
    */
  def reconstruct(
      changes: Dataset[ChangeEvent],
      txns: Dataset[TxnEvent],
      countGated: Boolean = false,
      ttl: Option[java.time.Duration] = None)
      : Dataset[TransactionRecord] = {
    val spark = changes.sparkSession
    import spark.implicits._

    val unioned =
      changes.map(UnionEvent.fromChange).union(txns.map(UnionEvent.fromTxn))

    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    unioned
      .groupByKey(_.transactionId)
      .flatMapGroupsWithState[TxnBuf, TransactionRecord](
        OutputMode.Append, timeoutConf) {
        (txnId: String, batch: Iterator[UnionEvent],
         state: GroupState[TxnBuf]) =>
          if (state.hasTimedOut) {
            // Leak fix: drop state for transactions that never ended.
            state.remove()
            Iterator.empty
          } else {
            val out = applyBatch(txnId, batch, state, countGated)
            if (state.exists)
              ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
            out
          }
      }
  }

  /** Event-time eviction variant — the semantically faithful leak fix
    * for replay/backfill, where a processing-time TTL would evict
    * in-flight transactions at replay speed rather than stream speed.
    * A transaction that never sees END is dropped once the event-time
    * watermark passes its newest buffered event by `evictionHorizon`.
    *
    * The watermark source matches the reference, which assigns its
    * watermark on the change-event stream
    * (`DebeziumTransactionReconstructor.java:57-61`, `ts_ms` minus a
    * 1-minute bound) — and unlike the reference, the bound is
    * ENFORCED: change events arriving later than `watermarkDelay`
    * behind the stream are dropped as late. **Design decision (txn
    * markers carry no timestamp):** boundary markers ride through the
    * union with a NULL event time — a null never advances the
    * watermark (the max ignores it) and never matches the late-row
    * predicate (null comparison → false), so markers are exempt from
    * both late-dropping and watermark generation; the eviction clock
    * is driven solely by change events. A marker-only transaction
    * (END for events that never arrive) times out `evictionHorizon`
    * past the watermark at its arrival.
    */
  /** Union the two typed streams with a watermarked event-time column.
    * The watermark-tagged attribute must survive into the stateful
    * operator's input (the analyzer rejects event-time timeouts when a
    * typed map projects it away), so the event-time column rides
    * through the union NEXT TO the UnionEvent fields and the watermark
    * is declared on the unioned frame; txn markers carry NULL event
    * time (never advance the watermark, never dropped as late). Shared
    * by this module's event-time variant and the state-API-v2 one.
    */
  private[cdc] def unionWithEventTime(
      changes: Dataset[ChangeEvent],
      txns: Dataset[TxnEvent],
      watermarkDelay: java.time.Duration): Dataset[UnionEvent] = {
    val spark = changes.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, timestamp_millis}
    val changeDf = changes.map(UnionEvent.fromChange).toDF()
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
    val txnDf = txns.map(UnionEvent.fromTxn).toDF()
      .withColumn("eventTime",
        lit(null).cast(org.apache.spark.sql.types.TimestampType))
    changeDf.unionByName(txnDf)
      .withWatermark("eventTime",
        s"${watermarkDelay.toMillis} milliseconds")
      .as[UnionEvent]
  }

  def reconstructEventTime(
      changes: Dataset[ChangeEvent],
      txns: Dataset[TxnEvent],
      countGated: Boolean = false,
      watermarkDelay: java.time.Duration = java.time.Duration.ofMinutes(1),
      evictionHorizon: java.time.Duration = java.time.Duration.ofMinutes(5))
      : Dataset[TransactionRecord] = {
    val spark = changes.sparkSession
    import spark.implicits._

    val unioned = unionWithEventTime(changes, txns, watermarkDelay)
    val horizonMs = evictionHorizon.toMillis

    unioned
      .groupByKey(_.transactionId)
      .flatMapGroupsWithState[TxnBuf, TransactionRecord](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (txnId: String, batch: Iterator[UnionEvent],
         state: GroupState[TxnBuf]) =>
          if (state.hasTimedOut) {
            // Replay-safe leak fix: watermark passed newest event +
            // horizon and END never came — drop the buffer.
            state.remove()
            Iterator.empty
          } else {
            val out = applyBatch(txnId, batch, state, countGated)
            if (state.exists) {
              // Timeout at (newest buffered event + horizon). A buffer
              // holding only markers has no event time — it gets the
              // full horizon from the CURRENT watermark (not wm + 1,
              // which would evict an END-first transaction on the very
              // next watermark advance). Clamped above the watermark
              // (Spark requires it) for overdue buffers.
              val wm = state.getCurrentWatermarkMs()
              val evts = state.get.events
              val base =
                if (evts.nonEmpty)
                  evts.foldLeft(0L)((m, e) => math.max(m, e.tsMs)) +
                    horizonMs
                else wm + horizonMs
              state.setTimeoutTimestamp(math.max(base, wm + 1))
            }
            out
          }
      }
  }

  /** Full pipeline: raw Debezium JSON strings → reconstructed
    * transactions (parse → discriminate → correlate → assemble).
    */
  def fromRawStrings(
      raw: Dataset[String],
      countGated: Boolean = false): Dataset[TransactionRecord] = {
    val (changes, txns, _) = graft.ingest.DebeziumParser.parseAndSplit(raw)
    reconstruct(changes, txns, countGated)
  }
}
