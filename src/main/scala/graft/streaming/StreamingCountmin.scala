package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming count-min sketch — the online counterpart of the batch
  * `q_countmin` calibration ([[graft.llm.Sketches]]): a document
  * stream maintains token-frequency counters whose TOTAL size is
  * fixed (D×B cells) no matter how much data flows through.
  *
  * Construction, and why it scales:
  *  - **The sketch IS a streaming aggregation.** Each token expands
  *    to its D (row, bucket) cells ([[graft.llm.Sketches.cmsCells]],
  *    shared with batch so the counters are value-identical by
  *    construction) and a `groupBy(row_i, bkt).count()` accumulates
  *    them. Spark's incremental state store keeps exactly D·B = 1536
  *    running counts — state does not grow with the stream, the
  *    defining property of a sketch.
  *  - **Map-side partial aggregation still applies**: each micro-batch
  *    shuffles at most D·B partial counts per partition, not tokens.
  *  - **Complete output mode is safe HERE** (and only here): the
  *    result relation is the 1536-cell sketch, so re-emitting it
  *    per batch is O(1), unlike a per-key aggregation over an
  *    unbounded key space.
  *
  * Point estimates read the latest snapshot with the same
  * min-over-rows arithmetic as batch ([[estimateFor]]).
  */
object StreamingCountmin {

  /** Running sketch counters from a stream with a `text` column.
    * Output: (row_i, bkt, cnt) — at most D·B rows.
    */
  def counters(docs: DataFrame): DataFrame = {
    graft.functions.PolyHash.register(docs.sparkSession)
    val toks = docs
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(graft.llm.Sketches.mixed(
        graft.functions.PolyHash.poly_hash(col("tok"))).as("x"))
    graft.llm.Sketches.cmsCells(toks)
      .groupBy(col("row_i"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Batch-side point estimates against a counter snapshot: for each
    * probe token, min over its D cells — identical arithmetic to the
    * batch `q_countmin`. The probe frame is small (a watchlist), the
    * snapshot is ≤ D·B rows → both sides '''broadcast'''-friendly.
    */
  def estimateFor(probes: DataFrame, snapshot: DataFrame): DataFrame = {
    graft.functions.PolyHash.register(probes.sparkSession)
    val hashed = probes
      .select(col("tok"), graft.llm.Sketches.mixed(
        graft.functions.PolyHash.poly_hash(col("tok"))).as("x"))
    hashed
      .select(col("tok"),
        explode(array((0 until graft.llm.Sketches.CMS_D).map { i =>
          struct(lit(i).as("row_i"),
            graft.llm.Sketches.bucket(col("x"), i).as("bkt"))
        }: _*)).as("rb"))
      .select(col("tok"), col("rb.row_i").as("row_i"),
        col("rb.bkt").as("bkt"))
      .join(broadcast(snapshot), Seq("row_i", "bkt"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
