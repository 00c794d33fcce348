package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming per-day distinct-user registers — the online store behind
  * live DAU/WAU/MAU: [[StreamingHll]] keyed BY DAY. Each event folds
  * its user into that day's 64-register HyperLogLog sketch
  * (`groupBy(day, register).max(ρ)`, Update mode); per-day cardinality
  * is the HLL estimate of the day's registers, and the trailing-7/28
  * windows `q_active_users` computes exactly come from register-wise
  * max across the window's days — the mergeability the batch sketch
  * family pins by law. This is precisely the warehouse-scale swap
  * `q_active_users`' scaladoc promises: the exact contribution
  * expansion is the calibration twin, this is what actually runs on
  * the unbounded stream.
  *
  * No watermark: register max is monotone, so late events can only
  * raise a register toward the value the batch recompute would hold —
  * never corrupt state. State = 64 longs per ACTIVE DAY
  * (calendar-bounded, independent of event volume); each micro-batch
  * map-side combines to ≤ 64·days partials before the shuffle.
  *
  * Batch parity by construction: day, register index, and ρ come from
  * the same column derivations the batch `q_hll` sketch uses
  * (`Sketches.mixed ∘ poly_hash` on the stringified user id), so after
  * any batch split the online register table equals the batch sketch
  * of the union exactly — `StreamingDauSpec` pins it, including an
  * overlapping replay that a count-based distinct would double-count.
  */
object StreamingDau {

  /** Live (day, j, m_j) register table over an events stream with
    * `ts` and `user_id` columns; write with OutputMode.Update.
    */
  def registers(events: DataFrame): DataFrame = {
    val h = events.select(
      expr("unix_micros(ts) div 86400000000").as("day"),
      graft.llm.Sketches.mixed(
        graft.functions.PolyHash.poly_hash(
          col("user_id").cast("string"))).as("h"))
    val (jc, rhoc) = graft.llm.Sketches.hllRegRho
    h.select(col("day"), jc.as("j"), rhoc.as("rho"))
      .groupBy(col("day"), col("j")).agg(max(col("rho")).as("m_j"))
  }

  /** Trailing `w`-day active-user estimates off the LIVE register
    * store: register-wise max across each trailing window, then the
    * per-day integer HLL readout — both delegated to the exact
    * functions the oracle-checked batch `q_active_users_hll` runs
    * ([[graft.llm.Sketches.hllTrailingMerge]] /
    * [[graft.llm.Sketches.hllDayEstimate]]), so the live readout and
    * the batch recompute agree by construction (pinned in
    * `StreamingDauSpec`). `regTable` is the materialized (day, j, m_j)
    * sink of [[registers]] — 64 rows per active day, so this merge
    * reads O(days·64·w) longs regardless of event volume; run it as a
    * cheap batch over the store after any micro-batch, the standard
    * lambda-free serving pattern for sketch stores.
    */
  def trailingEstimates(regTable: DataFrame, w: Int,
      out: String): DataFrame =
    graft.llm.Sketches.hllDayEstimate(
      graft.llm.Sketches.hllTrailingMerge(regTable, w), out)
}
