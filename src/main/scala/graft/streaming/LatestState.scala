package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming latest-state maintenance — the streaming twin of the
  * batch `q_latest_state` snapshot (`graft.cdc.Scd`): a keyed state
  * holds the current last-writer-wins row per entity, and every
  * micro-batch emits the refreshed snapshot row for each key it
  * touched (Update output mode — the contract of a CDC mirror sink).
  *
  * Out-of-order safety: the winner is the max (ts, event_id) of the
  * buffered snapshot and the batch's rows, so a late event older than
  * the current state cannot regress the mirror — the property a
  * processing-time `dropDuplicates` or last-row-wins foreachBatch
  * overwrite does NOT have.
  *
  * Scale: state is ONE row per entity (not a buffer), hash-partitioned
  * by key across executors, RocksDB-backed in production; each batch
  * shuffles only its own rows.
  */
object LatestState {

  case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Snapshot(user_id: Long, last_event_id: Long,
      last_ts: Timestamp, last_type: String, last_value: Double)

  private def newer(a: Snapshot, b: Snapshot): Snapshot =
    if (a.last_ts.getTime > b.last_ts.getTime ||
      (a.last_ts.getTime == b.last_ts.getTime &&
        a.last_event_id >= b.last_event_id)) a
    else b

  /** One snapshot row per key per batch with data; use with
    * `OutputMode.Update`.
    */
  def latest(events: Dataset[EventRow]): Dataset[Snapshot] = {
    implicit val snapEnc = Encoders.product[Snapshot]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[Snapshot]) =>
          val fromBatch = rows
            .map(e => Snapshot(uid, e.event_id, e.ts, e.event_type, e.value))
            .reduce(newer)
          val snap = state.getOption.fold(fromBatch)(newer(_, fromBatch))
          state.update(snap)
          snap
      }
  }

  /** Output mode this operator requires (one-row-per-touched-key). */
  val outputMode: OutputMode = OutputMode.Update()
}
