package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming data-quality monitor — the online form of the batch
  * `q_constraints` audit (`graft.ops.Operational`): a stream of events
  * is checked row-by-row against declarative constraints and the
  * violations are counted per event-time window, so a bad upstream
  * deploy shows up one watermark delay after it ships, not at the
  * next nightly audit.
  *
  * Construction, and why it scales:
  *  - **Domain checks are stream-static LEFT ANTI joins against a
  *    '''broadcast''' dimension** — stateless (no streaming state at
  *    all): each micro-batch probes the broadcast hash relation and
  *    drops matches. The dimension (valid event types, live customer
  *    keys, ...) refreshes by restarting the query or via a Delta-style
  *    re-readable source; either way the stream side never shuffles.
  *  - **Range/null checks are map-only predicates.**
  *  - **One windowed aggregation** over the unioned violation stream:
  *    state is (windows × checks) counters — bounded by the watermark
  *    horizon, independent of event volume. Append mode emits each
  *    window's final counts when the watermark passes; late rows
  *    beyond the delay are dropped (counted windows are CLOSED, the
  *    operational contract a pager needs).
  */
object StreamingConstraints {

  /** Violation counts per (event-time window, check) over an event
    * stream. `validTypes` is the static domain dimension (one `et`
    * column); `maxValue` bounds the value-range check.
    */
  def monitor(events: DataFrame, validTypes: DataFrame,
      maxValue: Double = 1e6, windowLen: String = "1 minute",
      watermarkDelay: String = "1 minute"): DataFrame = {
    val ts = col("ts")
    // The watermark MUST be assigned on the source, BEFORE the
    // violation filters: a healthy stream produces no violation rows,
    // and a watermark computed after the filters would then never
    // advance — the aggregation would hold every window open forever
    // and emit nothing (including the all-clear). Watermarked-first,
    // clean rows still flow through the event-time tracker before
    // being filtered, so windows close on schedule even at zero
    // violations (spec-pinned).
    val wm = events.withWatermark("ts", watermarkDelay)
    val unknownType = wm
      .join(broadcast(validTypes),
        col("event_type") === col("et"), "left_anti")
      .select(ts, lit("unknown_event_type").as("check"))
    val outOfRange = wm
      .filter(col("value") < 0 || col("value") > maxValue)
      .select(ts, lit("value_out_of_range").as("check"))
    val nullUser = wm
      .filter(col("user_id").isNull)
      .select(ts, lit("null_user_id").as("check"))
    unknownType.union(outOfRange).union(nullUser)
      .groupBy(window(ts, windowLen), col("check"))
      .agg(count(lit(1)).as("n_violations"))
      .select(col("window.start").as("window_start"), col("check"),
        col("n_violations"))
  }
}
