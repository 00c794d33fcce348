package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming funnel progression — the live twin of the batch
  * `q_funnel` ordered-stage query (`ops/Operational.qFunnel`): per
  * user, the furthest stage reached through view → click → purchase
  * where each stage must land strictly AFTER the previous one, updated
  * as events arrive. The batch query reports corpus-wide stage counts
  * after the fact; this keyed state answers "which stage is this user
  * at RIGHT NOW" the moment an event lands — the trigger shape for
  * cart-abandonment nudges and conversion alerting.
  *
  * State per key is THREE timestamps (first view, first qualifying
  * click, first qualifying purchase) — constant regardless of stream
  * length; no watermark needed because stage timestamps are monotone
  * under the arrival-order contract shared with [[StreamingStreaks]] /
  * [[StreamingEwma]]: in-batch rows are processed in event-time order
  * and batches are per-key monotone, so the greedy first-qualifying
  * match equals the batch min-qualifying-timestamp semantics (an event
  * at or before the previous stage's timestamp does not qualify, same
  * as the batch `ts > t_prev` join filter).
  *
  * `StreamingFunnelSpec` proves parity: after streaming the corpus in
  * multiple batches, every user's final stage equals the batch
  * three-join recompute.
  */
object StreamingFunnel {

  case class Ev(user_id: Long, event_type: String, ts: java.sql.Timestamp)

  /** Micros since epoch of each stage's first qualifying event;
    * [[UNSET]] until reached. Stage = count of set fields.
    */
  case class FunnelState(viewUs: Long, clickUs: Long, purchaseUs: Long)

  case class Progress(user_id: Long, funnel_stage: Int,
      stage_ts: java.sql.Timestamp)

  private val UNSET = Long.MinValue

  /** Micros since epoch: whole seconds from getTime (whose millis
    * already duplicate the nanos' millisecond part) + the full
    * sub-second from getNanos.
    */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def funnelPerUser(events: DataFrame): Dataset[Progress] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long"), $"event_type", $"ts")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Progress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state) =>
          var st = state.getOption.getOrElse(FunnelState(UNSET, UNSET, UNSET))
          val before = st
          var lastTs: java.sql.Timestamp = null
          batch.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
            val us = micros(e.ts)
            e.event_type match {
              case "view" if st.viewUs == UNSET =>
                st = st.copy(viewUs = us); lastTs = e.ts
              case "click" if st.clickUs == UNSET &&
                  st.viewUs != UNSET && us > st.viewUs =>
                st = st.copy(clickUs = us); lastTs = e.ts
              case "purchase" if st.purchaseUs == UNSET &&
                  st.clickUs != UNSET && us > st.clickUs =>
                st = st.copy(purchaseUs = us); lastTs = e.ts
              case _ => // no stage transition
            }
          }
          state.update(st)
          if (st != before) {
            val stage = Seq(st.viewUs, st.clickUs, st.purchaseUs)
              .count(_ != UNSET)
            Iterator.single(Progress(uid, stage, lastTs))
          } else Iterator.empty
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
