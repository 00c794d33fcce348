package graft.cdc

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch analog of the reference's transaction reconstruction.
  *
  * The reference (`DebeziumTransactionReconstructor.java:131-170`)
  * buffers change events per `transactionId` in keyed state and emits
  * one record per transaction when the END marker arrives. Over the
  * `events` table the same semantics are a grouped aggregation:
  * `user_id` plays the transaction id, `event_type == "purchase"`
  * plays the END marker, and the per-transaction event list is
  * assembled with `collect_list(struct(...))` sorted by `(ts,
  * event_id)` — a determinism improvement over the reference's
  * arrival-order `List.add` (`TransactionState.java:15-17`).
  *
  * Scale: one hash-partition shuffle on the group key with map-side
  * partial aggregation; no driver-side collection. The per-key event
  * list is the only unbounded structure — same memory shape as the
  * reference's `ValueState` buffer, but spill-capable under Spark's
  * `ObjectHashAggregate`/sort-based fallback.
  */
object BatchReconstruction {

  def reconstruct(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(col("user_id").as("transaction_id"))
      .agg(
        count(lit(1)).as("n_events"),
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id")))),
          x => x.getField("event_id")
        ).as("event_ids"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        Det.dsum(col("value")).as("total_value"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("has_end")
      )
      .filter(col("has_end") === 1)
      .drop("has_end")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_reconstruct" -> reconstruct
  )

  val oracles: Map[String, String] = Map(
    "cdc_reconstruct" ->
      s"""SELECT user_id AS transaction_id,
         |       count(*) AS n_events,
         |       list(event_id ORDER BY ts, event_id) AS event_ids,
         |       min(ts) AS first_ts,
         |       max(ts) AS last_ts,
         |       ${Det.dsumSql("value")} AS total_value
         |FROM events
         |GROUP BY user_id
         |HAVING max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
         |""".stripMargin
  )
}
