package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming HyperLogLog — the online twin of the batch `q_hll`
  * sketch (`graft.llm.Sketches`): the sketch IS a fixed-size streaming
  * aggregation, `groupBy(register).max(ρ)` in Update mode. Because max
  * is monotone, no watermark is needed and the state NEVER exceeds the
  * m = 64 register rows — the live-cardinality dashboard shape that
  * holds 64 longs forever while counting an unbounded distinct stream
  * (the same "sketch as aggregation" framing as `StreamingCountmin`).
  *
  * Batch parity by construction: register index and ρ come from the
  * SAME `Sketches.hllRegRho` column derivation the batch query uses,
  * so after any batch split the online register table equals the batch
  * sketch of the union exactly (register max is associative and
  * commutative — spec-pinned in `StreamingHllSpec`, including an
  * overlapping replay, which a COUNT-based distinct aggregation would
  * double-count and the sketch must not).
  *
  * Scale: each micro-batch map-side combines to ≤64 (register, ρ)
  * partials before the shuffle; the stateful agg touches at most 64
  * keys per batch regardless of stream volume.
  */
object StreamingHll {

  /** Live register table (j, m_j) over a stream with a `text` column;
    * write with OutputMode.Update (also named "complete"-safe: ≤64
    * rows).
    */
  def registers(texts: DataFrame): DataFrame = {
    val h = texts.select(
      graft.llm.Sketches.mixed(
        graft.functions.PolyHash.poly_hash(col("text"))).as("h"))
    val (jc, rhoc) = graft.llm.Sketches.hllRegRho
    h.select(jc.as("j"), rhoc.as("rho"))
      .groupBy(col("j")).agg(max(col("rho")).as("m_j"))
  }
}
