package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming operator library: watermarked time windows and streaming
  * dedup — the window/watermark surface the reference only gestures at
  * (its watermark is assigned but never consumed, SURVEY.md §2.3) made
  * first-class.
  *
  * All functions take an unbounded DataFrame (from `readStream`) with
  * an event-time column and return a transformed unbounded frame; the
  * caller attaches the sink. Batch frames work too (Spark's unified
  * API), which is how the DuckDB oracles cover the same logic via the
  * batch twins in [[graft.ops.RelationalQueries]].
  */
object StreamOps {

  /** Tumbling-window aggregation with late-data drop after
    * `watermarkDelay` (the reference's 1-minute bounded
    * out-of-orderness, `DebeziumTransactionReconstructor.java:57-61`,
    * actually enforced).
    */
  def tumblingCounts(events: DataFrame, tsCol: String,
      watermarkDelay: String = "1 minute",
      windowLen: String = "1 hour",
      keys: Seq[Column] = Nil): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen) +: keys: _*)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start") +: keys :+ col("n")
        :+ col("total"): _*)

  /** Sliding-window aggregation. */
  def slidingCounts(events: DataFrame, tsCol: String,
      watermarkDelay: String = "1 minute",
      windowLen: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session-window aggregation (gap-based), the streaming twin of the
    * batch sessionization query.
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes",
      watermarkDelay: String = "1 minute"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"))

  /** Streaming exact dedup with bounded state: duplicates dropped
    * within the watermark horizon (state for keys older than the
    * watermark is purged — dedup state cannot grow without bound).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      keyCols: Seq[String],
      watermarkDelay: String = "1 minute"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-static enrichment join: every micro-batch joins against
    * the static dimension frame — broadcast, stateless, and always
    * up-to-date with the dimension's source (contrast with the
    * stream-stream joins, which buffer both sides in the state store).
    * This is the right operator when the enrichment side is a table,
    * not a stream — the case the reference's `EventCorrelator` cache
    * (`...WithEventCorrelation.java:128-165`) approximates by hand.
    */
  def staticEnrich(stream: DataFrame, dim: DataFrame,
      joinKeys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), joinKeys, "left_outer")

  /** Stream-stream equi join bounded by an event-time interval:
    * right rows join left rows of the same key within
    * `[tsL - bound, tsL + bound]`. The time constraint plus the two
    * watermarks let Spark prune join state on both sides — without it
    * a stream-stream join buffers forever (the unbounded-state trap
    * the reference's GlobalWindow variant actually has,
    * `...WithEventCorrelation.java:81-83`).
    */
  /** `joinType` "inner" (default) or "left_outer": outer emits the
    * null-padded left row once the watermark proves no match can still
    * arrive — late-but-bounded completeness, impossible without the
    * interval constraint.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      tsL: String, tsR: String,
      bound: String = "10 minutes",
      watermarkDelay: String = "1 minute",
      joinType: String = "inner"): DataFrame =
    left.withWatermark(tsL, watermarkDelay)
      .join(
        right.withWatermark(tsR, watermarkDelay),
        expr(s"""$leftKey = $rightKey
                |AND $tsR >= $tsL - INTERVAL $bound
                |AND $tsR <= $tsL + INTERVAL $bound""".stripMargin),
        joinType)
}
