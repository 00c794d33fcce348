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
    *        `Some(d)` arms the leak fix (production default); `None`
    *        disables timeouts entirely — required when driving the
    *        query with `processAllAvailable()` in tests, because
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
            // Within a micro-batch, apply change events (in event-time
            // order) before boundary markers — a deterministic choice
            // where the reference depends on thread arrival order.
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
              ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
              Iterator.empty
            }
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
