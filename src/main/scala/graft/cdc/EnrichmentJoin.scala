package graft.cdc

import graft.model._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** The reference's pipeline 2, stage 1: enrich each change event with
  * its transaction's metadata (`EventCorrelator`,
  * `DebeziumTransactionReconstructorWithEventCorrelation.java:128-165`).
  *
  * The reference implements this as a `CoProcessFunction` with a
  * `MapState` metadata cache and **drops change events whose metadata
  * hasn't arrived yet** (`:146-149` — a WARN and a data loss on
  * arrival-order races). Spark's native form is a watermarked
  * stream-stream equi-join: both sides buffer in the state store, so
  * either arrival order within the watermark horizon joins correctly —
  * strictly better than the reference, as SURVEY.md §2.2 J2 requires.
  *
  * Scale: both sides hash-partition on `transactionId`; join state is
  * bounded by the watermark (late side evicted past
  * `watermarkDelay`). No broadcast — both sides are unbounded.
  */
object EnrichmentJoin {

  /** Correlate change events with END-marker metadata.
    *
    * Batch usage (finite Datasets) joins directly; streaming usage
    * should apply `withWatermark` on both inputs first (see
    * `EnrichmentJoinSpec`) so state stays bounded.
    */
  def correlate(
      changes: Dataset[ChangeEvent],
      txns: Dataset[TxnEvent]): Dataset[CorrelatedEvent] = {
    import changes.sparkSession.implicits._
    val ends = txns.filter(col("status") === "END")
    changes
      .joinWith(ends, changes("transactionId") === ends("transactionId"),
        "inner")
      .map { case (c, t) => CorrelatedEvent(c, t) }
  }
}

/** Change event + its transaction metadata.
  * ≈ `CorrelatedEvent`, `...WithEventCorrelation.java:210-222`.
  */
case class CorrelatedEvent(changeEvent: ChangeEvent, metadata: TxnEvent)
