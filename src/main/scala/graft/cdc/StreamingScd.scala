package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.LatestState.EventRow

/** Streaming SCD Type-2 maintenance — the streaming twin of the batch
  * [[Scd]] `q_scd2`: per entity, the open validity interval lives in
  * keyed state; when an attribute change arrives, the open interval is
  * CLOSED (its `valid_to` = the change's event time) and emitted —
  * closed intervals are immutable facts, so the sink appends them
  * (`OutputMode.Append`); the one open interval per key stays in state
  * until its closing change arrives.
  *
  * Ordering: rows are processed in (ts, event_id) order within each
  * batch; a row at-or-before the state's high-water mark is LATE and
  * ignored (the batch q_scd2 over the full log is the replay/repair
  * path — the documented CDC-mirror convention). Same-type events only
  * advance the high-water mark, mirroring the batch run-length
  * collapse.
  *
  * Scale: state is one open interval per entity (bounded by key
  * cardinality, like [[graft.streaming.LatestState]]); emission volume
  * is one row per actual attribute change.
  */
object StreamingScd {

  /** Open interval in state: current type + start + high-water mark. */
  case class Open(event_type: String, valid_from: Timestamp,
      last_ts: Timestamp, last_event_id: Long)

  /** A closed SCD2 interval (is_current = false by construction). */
  case class ClosedInterval(user_id: Long, event_type: String,
      valid_from: Timestamp, valid_to: Timestamp)

  private def isAfter(ts: Timestamp, id: Long, o: Open): Boolean =
    ts.getTime > o.last_ts.getTime ||
      (ts.getTime == o.last_ts.getTime && id > o.last_event_id)

  /** Closed intervals per attribute change; use with
    * `OutputMode.Append`.
    */
  def closedIntervals(events: Dataset[EventRow])
      : Dataset[ClosedInterval] = {
    implicit val outEnc = Encoders.product[ClosedInterval]
    implicit val stateEnc = Encoders.product[Open]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[Open]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[ClosedInterval]
          var st = state.getOption
          sorted.foreach { e =>
            st match {
              case None =>
                st = Some(Open(e.event_type, e.ts, e.ts, e.event_id))
              case Some(o) if !isAfter(e.ts, e.event_id, o) =>
                () // late row: older than the high-water mark — ignored
              case Some(o) if o.event_type == e.event_type =>
                st = Some(o.copy(last_ts = e.ts, last_event_id = e.event_id))
              case Some(o) =>
                out += ClosedInterval(uid, o.event_type, o.valid_from, e.ts)
                st = Some(Open(e.event_type, e.ts, e.ts, e.event_id))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Output mode this operator requires (closed intervals are final). */
  val outputMode: OutputMode = OutputMode.Append()
}
