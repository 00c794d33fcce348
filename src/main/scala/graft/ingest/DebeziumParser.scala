package graft.ingest

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Declarative re-expression of the reference's per-record JSON parser
  * (`DebeziumJsonParser`, `DebeziumTransactionReconstructor.java:97-129`).
  *
  * The reference parses with Jackson row-at-a-time and returns `null`
  * on malformed input; here the same semantics are a codegen'd
  * `from_json` projection, with malformed rows routed to a dead-letter
  * frame instead of a never-consumed side output
  * (`OutputTag("invalid-events")`, `:133,151,167`).
  */
object DebeziumParser {

  /** Parse raw JSON strings (column `value`) into the typed envelope.
    * PERMISSIVE mode: malformed JSON or missing `payload` → null
    * payload, exactly the reference's null-return branches
    * (`:104-107,124-127`).
    */
  def parse(raw: DataFrame): DataFrame =
    raw.withColumn("payload",
      from_json(col("value"), Envelope.envelopeSchema).getField("payload"))

  /** Split of a parsed frame into (change events, txn events,
    * dead letter). Discriminator: presence of the `status` KEY in the
    * payload — the reference checks `payload.has("status")`
    * (`DebeziumTransactionReconstructor.java:109`), so an envelope
    * carrying an explicit `"status": null` still routes to the
    * transaction stream. `from_json` cannot distinguish missing from
    * null, so key presence is read from the raw JSON via
    * `json_object_keys`. A null status value surfaces as "" (the same
    * Jackson `path().asText()` default used for the other fields).
    */
  def split(parsed: DataFrame)
      : (Dataset[ChangeEvent], Dataset[TxnEvent], DataFrame) = {
    import parsed.sparkSession.implicits._

    val dead = parsed.filter(col("payload").isNull).select(col("value"))

    val hasStatusKey = coalesce(
      array_contains(
        json_object_keys(get_json_object(col("value"), "$.payload")),
        "status"),
      lit(false))

    val txn = parsed
      .filter(col("payload").isNotNull && hasStatusKey)
      .select(
        // Jackson `path(...).asText()` yields "" for a missing node —
        // mirrored with coalesce (`:111-113`).
        coalesce(col("payload.id"), lit("")).as("transactionId"),
        coalesce(col("payload.status"), lit("")).as("status"),
        col("payload.event_count").as("eventCount"))
      .as[TxnEvent]

    val change = parsed
      .filter(col("payload").isNotNull && !hasStatusKey)
      .select(
        coalesce(col("payload.transaction.id"), lit(""))
          .as("transactionId"),
        coalesce(col("payload.op"), lit("")).as("operation"),
        coalesce(col("payload.ts_ms"), lit(0L)).as("tsMs"),
        col("payload.before").as("before"),
        col("payload.after").as("after"))
      .as[ChangeEvent]

    (change, txn, dead)
  }

  /** Convenience: raw strings → typed streams in one call. */
  def parseAndSplit(raw: Dataset[String])
      : (Dataset[ChangeEvent], Dataset[TxnEvent], DataFrame) =
    split(parse(raw.toDF("value")))
}
