package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MERGE — the continuous twin of the batch `q_merge`
  * statement (`graft.cdc.Scd`): each micro-batch upserts into a keyed
  * last-writer-wins mirror, and an `error` event is the DELETE
  * tombstone. Emissions follow the CDC-sink contract: an upsert emits
  * the refreshed row with `deleted = false`; a delete emits the key
  * with `deleted = true` so a downstream mirror can drop it —
  * streaming sinks cannot "un-emit", so deletes must travel as
  * explicit tombstones (the same reason Debezium publishes them;
  * reference provenance: the reference pipeline's transaction stream
  * is exactly such an envelope feed, `DebeziumTransactionReconstructor
  * .java` — this operator is the MAINTAINED-TABLE consumer of it).
  *
  * Out-of-order safety — the property a foreachBatch overwrite does
  * not have: the winner is always the max (ts, event_id) of state and
  * batch, so a late pre-delete event can neither regress a newer row
  * NOR resurrect a deleted key (the tombstone stays in state and keeps
  * winning until a genuinely newer upsert arrives). Convergence
  * therefore matches the batch `q_merge` on ANY batch split of the
  * same events — spec-pinned against the batch result over the full
  * corpus.
  *
  * Scale: ONE row of state per key (the tombstone included),
  * hash-partitioned by key, RocksDB-backed in production; each batch
  * shuffles only its own rows. Tombstone retention is deliberate —
  * dropping it on delete would reopen the resurrection race; a real
  * deployment ages tombstones out with a TTL beyond the replay
  * horizon (the `StreamingReconstruction` TTL pattern).
  */
object StreamingMerge {

  case class MergeOut(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String, value: Double, deleted: Boolean)

  private def newer(a: MergeOut, b: MergeOut): MergeOut =
    if (a.ts.getTime > b.ts.getTime ||
      (a.ts.getTime == b.ts.getTime && a.event_id >= b.event_id)) a
    else b

  /** One row per key per batch with data (Update output mode):
    * the current merged row, or its tombstone with `deleted = true`.
    */
  def merged(events: Dataset[LatestState.EventRow]): Dataset[MergeOut] = {
    implicit val outEnc = Encoders.product[MergeOut]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[LatestState.EventRow],
         state: GroupState[MergeOut]) =>
          val fromBatch = rows
            .map(e => MergeOut(uid, e.event_id, e.ts, e.event_type,
              e.value, e.event_type == "error"))
            .reduce(newer)
          val win = state.getOption.fold(fromBatch)(newer(_, fromBatch))
          state.update(win)
          win
      }
  }

  /** Output mode this operator requires (one-row-per-touched-key). */
  val outputMode: OutputMode = OutputMode.Update()
}
