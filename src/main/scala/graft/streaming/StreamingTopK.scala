package graft.streaming

import graft.functions.TopKAggregate
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming per-key top-k: each key's k largest values maintained as
  * keyed state, with the current top-k snapshot emitted whenever the
  * key receives data — the live leaderboard / threshold-monitor
  * pattern.
  *
  * The state transition IS the batch aggregator: every micro-batch
  * folds through [[graft.functions.TopKAggregate.reduce]], the same
  * bounded mergeable kernel the batch `q_topk_agg` query runs — so
  * batch/streaming value parity holds by construction (and the
  * kernel's partition-independence is property-tested in
  * `FunctionLawsProps`). State per key is exactly k doubles —
  * bounded, regardless of stream length; no watermark needed because
  * the aggregate is monotone (late data folds in like any other
  * arrival).
  */
object StreamingTopK {

  case class Entry(key: String, value: Double)

  /** Current top-k snapshot for a key (values descending). */
  case class TopKSnapshot(key: String, top: Seq[Double])

  def topKPerKey(events: DataFrame, keyCol: String, valueCol: String,
      k: Int = 5): Dataset[TopKSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    val agg = new TopKAggregate(k)
    events
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("double").as("value"))
      .as[Entry]
      .groupByKey(_.key)
      .mapGroupsWithState[Array[Double], TopKSnapshot](
        GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[Entry], state) =>
          var buf = state.getOption.getOrElse(agg.zero)
          // deterministic intra-batch fold order
          batch.toSeq.sortBy(e => (e.value, e.key)).foreach { e =>
            buf = agg.reduce(buf, e.value)
          }
          state.update(buf)
          TopKSnapshot(key, buf.toSeq)
      }
  }

  /** Output mode the sink must use: snapshots replace per key. */
  val outputMode: OutputMode = OutputMode.Update()
}
