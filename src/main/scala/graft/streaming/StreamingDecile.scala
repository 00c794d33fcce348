package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming decile assignment — the online form of the batch
  * `q_decile_lift` campaign readout (`ops/Operational.qDecileLift`):
  * the previous batch snapshot's score-decile BOUNDARIES are broadcast
  * into a STATELESS scoring stream, so each arriving (user, score) row
  * gets its decile map-side with no state store, no shuffle, and no
  * per-batch re-sort — the shape a live campaign dashboard or a
  * model-serving feature tag actually runs.
  *
  * Boundary semantics: `boundaries` carries each decile's MINIMUM
  * score under the batch cut (score DESC, so decile 1 holds the
  * highest scores and min_score is non-increasing in decile). A
  * streamed row is assigned the smallest decile whose min_score it
  * meets; rows below every boundary (a score the snapshot never saw)
  * land in decile 10. When scores are distinct at the batch boundaries
  * this reproduces the batch rank-cut exactly
  * (`StreamingDecileSpec` pins the parity); equal scores straddling a
  * batch boundary are inherently rank-split there and value-split
  * here — the documented, deterministic difference of the online form.
  *
  * Scale: the boundary frame is 10 rows → collected into a literal
  * array once per (re)broadcast; assignment is a codegen'd
  * `aggregate` over a 10-element array per row — no join node at all,
  * so the stream stays a stateless map (works under any output mode,
  * composes with watermarks untouched).
  */
object StreamingDecile {

  /** Per-decile minimum score under the batch cut — derive from the
    * batch users frame exactly as `q_decile_lift` cuts it.
    * Output: (decile INT, min_score BIGINT), 10 rows.
    */
  def boundaries(cut: DataFrame): DataFrame =
    cut.groupBy(col("decile"))
      .agg(min(col("score")).as("min_score"))

  /** Assign deciles to a (streaming or batch) frame bearing a `score`
    * column, using a snapshot's boundaries. Stateless and join-free:
    * the 10-row boundary frame is collected to a sorted literal and
    * inlined, so the plan is a pure projection.
    */
  def assign(scored: DataFrame, boundaries: DataFrame): DataFrame = {
    // 10 rows by contract — the collect is the "broadcast" of the
    // online form (re-run per snapshot refresh, never per row/batch).
    val mins = boundaries.select(col("decile"), col("min_score"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
      .map(_._2)
    require(mins.nonEmpty, "empty boundary snapshot")
    val arr = mins.mkString("array(", "L, ", "L)")
    // smallest decile whose min_score <= score
    //   = count of boundaries strictly above score, + 1 (capped).
    scored.withColumn("decile", expr(
      s"CAST(least(aggregate($arr, 0, (acc, m) -> " +
        s"acc + IF(m > score, 1, 0)) + 1, ${mins.length}) AS INT)"))
  }
}
