package graft.model

import org.apache.spark.sql.types._

/** Typed model of the Debezium envelope the reference consumes.
  *
  * Mirrors the fields the reference's parser actually reads
  * (`DebeziumTransactionReconstructor.java:103-122`): the fixed part of
  * the envelope is typed; the row images `before`/`after` stay opaque
  * JSON strings (the reference keeps them as untyped `JsonNode`,
  * `DebeziumChangeEvent.java:8-9` — schema inference over captured
  * tables is a non-goal).
  */
object Envelope {

  /** `payload` struct: superset of both topics' shapes. The
    * discriminator is presence of `status`
    * (`DebeziumTransactionReconstructor.java:109`).
    *
    * `before`/`after` are declared StringType: Spark's JSON parser
    * serializes any non-string JSON subtree back to its raw text for
    * StringType fields, which is exactly the opaque-passthrough the
    * reference implements with `JsonNode`.
    */
  val payloadSchema: StructType = StructType(Seq(
    // change-event fields (topic mysql-server.db_1.*)
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("transaction",
      StructType(Seq(StructField("id", StringType)))),
    StructField("before", StringType),
    StructField("after", StringType),
    // transaction-metadata fields (topic mysql-server.transaction)
    StructField("status", StringType),
    StructField("id", StringType),
    StructField("event_count", LongType)
  ))

  val envelopeSchema: StructType =
    StructType(Seq(StructField("payload", payloadSchema)))
}

/** One row-level change (insert/update/delete image).
  * ≈ `DebeziumChangeEvent.java:5-33`.
  */
case class ChangeEvent(
    transactionId: String,
    operation: String,
    tsMs: Long,
    before: Option[String],
    after: Option[String])

/** Transaction boundary marker (BEGIN/END) from the metadata topic.
  * ≈ `DebeziumTransactionEvent.java:3-24`.
  */
case class TxnEvent(
    transactionId: String,
    status: String,
    eventCount: Option[Long])

/** Output: one fully reconstructed transaction.
  * ≈ `TransactionRecord`, `DebeziumTransactionReconstructor.java:189-213`.
  */
case class TransactionRecord(
    transactionId: String,
    events: Seq[ChangeEvent],
    status: String,
    eventCount: Option[Long])

/** Union envelope for the two-input stateful operator: Spark has no
  * `KeyedCoProcessFunction`, so both sides are unioned into one stream
  * tagged by `isChange` and grouped once (SURVEY.md §2.1 J1).
  */
case class UnionEvent(
    transactionId: String,
    isChange: Boolean,
    operation: Option[String],
    tsMs: Option[Long],
    before: Option[String],
    after: Option[String],
    status: Option[String],
    eventCount: Option[Long])

object UnionEvent {
  def fromChange(e: ChangeEvent): UnionEvent =
    UnionEvent(e.transactionId, isChange = true, Some(e.operation),
      Some(e.tsMs), e.before, e.after, None, None)

  def fromTxn(e: TxnEvent): UnionEvent =
    UnionEvent(e.transactionId, isChange = false, None, None, None, None,
      Some(e.status), e.eventCount)
}
