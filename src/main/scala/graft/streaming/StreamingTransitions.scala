package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Markov transition extraction — the live twin of the
  * batch `q_transitions` query (`ops/Operational.qTransitions`): for
  * each arriving event, emit the (previous type → current type) pair
  * when the gap to the user's previous event is within the session
  * bound. Downstream a stateless micro-batch aggregation (or the
  * batch rollup over the emitted pairs) produces the same transition
  * matrix the batch lag-window computes — `StreamingTransitionsSpec`
  * proves pair-count parity over a streamed corpus.
  *
  * State per key is ONE (timestamp µs, type) tuple — constant,
  * regardless of stream length. The gap test runs on µs-exact longs
  * (the same `unix_micros` discipline as the batch query; ms-level
  * truncation would misclassify boundary gaps). Arrival-order
  * contract as [[StreamingEwma]]: in-batch rows are processed in
  * (ts, event_id) order, batches per-key monotone.
  */
object StreamingTransitions {

  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  case class Transition(user_id: Long, prev_type: String,
      event_type: String)

  /** µs since epoch without double-counting the sub-second part
    * (getTime carries ms, getNanos the full fractional second).
    */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def transitionsPerUser(events: DataFrame,
      gapSeconds: Long = 1800L): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .select($"user_id".cast("long"), $"event_id".cast("long"),
        $"ts", $"event_type".cast("string"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, String), Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Ev], state) =>
          var prev = state.getOption
          val out = batch.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .flatMap { e =>
              val us = micros(e.ts)
              val emit = prev.collect {
                case (pUs, pType) if us - pUs <= gapUs =>
                  Transition(e.user_id, pType, e.event_type)
              }
              prev = Some((us, e.event_type))
              emit
            }
          prev.foreach(state.update)
          out.iterator
      }
  }

  val outputMode: OutputMode = OutputMode.Append()
}
