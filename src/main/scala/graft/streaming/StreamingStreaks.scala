package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming activity-streak maintenance — the live twin of the batch
  * `q_streaks` gaps-and-islands query (`ops/Operational.qStreaks`):
  * per user, the CURRENT consecutive-day run and the BEST run so far,
  * updated as events arrive. The batch query reports the corpus-wide
  * streak histogram after the fact; this keyed state answers the
  * per-user question ("on a streak right now?") the moment an event
  * lands — the engagement-banner / notification-trigger shape.
  *
  * State per key is THREE longs (last day, current run, best run) —
  * constant regardless of stream length; no watermark needed because
  * the aggregate is monotone under the arrival-order contract shared
  * with [[StreamingEwma]]/[[StreamingTransitions]]: in-batch rows are
  * processed in event-time order, batches per-key monotone; a
  * same-day duplicate is a no-op and a regressed (late) day is
  * dropped, exactly like the batch query's DISTINCT (user, day)
  * collapse.
  *
  * `StreamingStreaksSpec` proves parity: after streaming the whole
  * corpus in multiple batches, every user's (cur, best) equals the
  * batch islands recompute (last island length, max island length).
  */
object StreamingStreaks {

  case class Ev(user_id: Long, ts: java.sql.Timestamp)

  /** lastDay = epoch day of the newest counted activity. */
  case class StreakState(lastDay: Long, cur: Long, best: Long)

  case class Streak(user_id: Long, last_day: java.sql.Date,
      cur_len: Long, best_len: Long)

  /** Epoch day in UTC — the session timezone, so it agrees with the
    * batch query's `to_date(ts)`.
    */
  private def epochDay(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 86400000L)

  def streaksPerUser(events: DataFrame): Dataset[Streak] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long"), $"ts")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StreakState, Streak](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state) =>
          var st = state.getOption.getOrElse(StreakState(Long.MinValue, 0L, 0L))
          val days = batch.map(e => epochDay(e.ts)).toSeq.distinct.sorted
          var touched = false
          days.foreach { d =>
            if (d == st.lastDay + 1)
              st = StreakState(d, st.cur + 1, math.max(st.best, st.cur + 1))
            else if (d > st.lastDay)
              st = StreakState(d, 1L, math.max(st.best, 1L))
            // d <= lastDay: same-day duplicate or late regression — no-op
            if (d >= st.lastDay) touched = true
          }
          state.update(st)
          if (touched)
            Iterator.single(Streak(uid,
              java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(st.lastDay)),
              st.cur, st.best))
          else Iterator.empty
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
