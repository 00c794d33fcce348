package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-user activity-span store — the live feed for
  * `q_kaplan_meier`'s horizon inputs ([[graft.ops.Operational]]): the
  * batch estimator's whole corpus pass collapses to ONE keyed state
  * row per user, (first_day, last_day), and that is exactly a
  * min/max-merging [[LatestState]]-mold store. Stream the spans;
  * at any read, `Operational.kmIntervals` over the store IS the batch
  * interval table of the corpus seen so far — survival-curve
  * freshness without re-scanning 100 TB of history per refresh.
  *
  * No watermark: min(first) and max(last) are monotone merges, so a
  * late or replayed event can only move state TOWARD the batch
  * recompute's value, never corrupt it (the [[StreamingDau]]
  * argument). Emits the refreshed span per touched user (Update mode
  * — the CDC-mirror sink contract).
  *
  * Scale: state is two longs per user, hash-partitioned, RocksDB in
  * production; each micro-batch map-side pre-aggregates its own rows
  * before touching state, so a hot user costs one state read/write
  * per batch, not per event.
  */
object StreamingHorizon {

  case class UserSpan(user_id: Long, first_day: Long, last_day: Long)

  /** Live (user_id, first_day, last_day) spans over an events stream
    * with `ts` and `user_id` columns; write with OutputMode.Update.
    */
  def spans(events: DataFrame): Dataset[UserSpan] = {
    import events.sparkSession.implicits._
    implicit val spanEnc = Encoders.product[UserSpan]
    events
      .select(col("user_id").cast("long").as("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)],
         state: GroupState[UserSpan]) =>
          var f = Long.MaxValue
          var l = Long.MinValue
          rows.foreach { case (_, day) =>
            if (day < f) f = day
            if (day > l) l = day
          }
          val merged = state.getOption.fold(UserSpan(uid, f, l))(s =>
            UserSpan(uid, math.min(s.first_day, f), math.max(s.last_day, l)))
          state.update(merged)
          merged
      }
  }

  /** Output mode this operator requires (one-row-per-touched-key). */
  val outputMode: OutputMode = OutputMode.Update()
}
