package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming exponentially-decayed per-user score — the live twin of
  * the batch `q_ewma` query (`ops/Operational.qEwma`): for each
  * arriving event, the half-life-weighted sum of the user's last 8
  * values, `Σ_{j=0..7} v_{t−j}·2^{7−j} / 255`.
  *
  * The scoring kernel ([[StreamingEwma.score]]) is shared text with
  * the batch lag chain — same power-of-two weights, same explicit
  * left-to-right fold — so batch/streaming value parity is exact
  * (IEEE ops in identical order), spec-verified in
  * `StreamingEwmaSpec` by streaming a corpus in multiple batches and
  * comparing against the batch window query row-for-row.
  *
  * State per key is exactly the last 7 values — bounded regardless of
  * stream length (the reason decayed scores, not full averages, back
  * real-time feature stores). Arrival-order contract: rows are
  * processed in (ts, event_id) order WITHIN each micro-batch, and
  * batches are assumed per-key monotone (the replay/CDC assumption;
  * a late row would need the event-time-buffered variant of
  * `StreamingReconstruction.reconstructEventTime`).
  */
object StreamingEwma {

  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      value: Double)

  case class EwmaRow(user_id: Long, event_id: Long, ewma: Double)

  /** The shared scoring kernel: current value + up-to-7 previous
    * values (most recent first), missing lags as 0.0 — the identical
    * term order and association as the batch lag chain.
    */
  def score(current: Double, prev: Seq[Double]): Double = {
    val vals = (current +: prev).padTo(8, 0.0)
    vals.zipWithIndex
      .map { case (v, j) => v * (1L << (7 - j)).toDouble }
      .reduce(_ + _) / 255.0
  }

  def ewmaPerUser(events: DataFrame): Dataset[EwmaRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("value").cast("double"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Double], EwmaRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Ev], state) =>
          var prev = state.getOption.getOrElse(Nil)
          // (ms, sub-second nanos, id) ≡ full-precision (ts, event_id):
          // getTime alone truncates to ms and could reorder micro ties
          val out = batch.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .map { e =>
              val s = score(e.value, prev)
              prev = (e.value :: prev).take(7)
              EwmaRow(e.user_id, e.event_id, s)
            }
          state.update(prev)
          out.iterator
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
