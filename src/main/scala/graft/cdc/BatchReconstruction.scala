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

  /** Raw-array form (event_ids: array<long>) — used by the ScalaTest
    * specs. The oracle-checked [[reconstruct]] string-encodes the array
    * because the driver's hasher cannot sort array cells.
    */
  def reconstructRaw(spark: SparkSession, dir: String): DataFrame = {
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

  /** Oracle-checked flagship: same as [[reconstructRaw]] but with the
    * event-id list pipe-joined to one string so the external driver
    * gate can hash it (pandas cannot sort ndarray cells).
    */
  def reconstruct(spark: SparkSession, dir: String): DataFrame =
    reconstructRaw(spark, dir)
      .withColumn("event_ids",
        array_join(transform(col("event_ids"), _.cast("string")), "|"))

  /** Downstream analytics OVER the reconstruction — the integration a
    * reference user runs next: distribution of transaction sizes with
    * value totals and wall-clock spans. Composes [[reconstructRaw]]
    * with the relational surface in one plan (reconstruction shuffle →
    * n_events hash agg; the second aggregation's partials carry one
    * row per (n_events) group).
    */
  def txnStats(spark: SparkSession, dir: String): DataFrame =
    reconstructRaw(spark, dir)
      .groupBy(col("n_events"))
      .agg(
        count(lit(1)).as("n_txns"),
        Det.dsum(col("total_value")).as("sum_value"),
        sum(unix_millis(col("last_ts")) - unix_millis(col("first_ts")))
          .as("total_span_ms"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_reconstruct" -> reconstruct,
    "q_txn_stats"     -> txnStats
  )

  val oracles: Map[String, String] = Map(
    "cdc_reconstruct" ->
      s"""SELECT user_id AS transaction_id,
         |       count(*) AS n_events,
         |       array_to_string(list(event_id ORDER BY ts, event_id), '|')
         |         AS event_ids,
         |       min(ts) AS first_ts,
         |       max(ts) AS last_ts,
         |       ${Det.dsumSql("value")} AS total_value
         |FROM events
         |GROUP BY user_id
         |HAVING max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
         |""".stripMargin,
    "q_txn_stats" ->
      s"""WITH txns AS (
         |  SELECT user_id AS transaction_id,
         |         count(*) AS n_events,
         |         min(ts) AS first_ts,
         |         max(ts) AS last_ts,
         |         ${Det.dsumSql("value")} AS total_value
         |  FROM events
         |  GROUP BY user_id
         |  HAVING max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |         = 1)
         |SELECT n_events, count(*) AS n_txns,
         |  ${Det.dsumSql("total_value")} AS sum_value,
         |  CAST(SUM(epoch_ms(last_ts) - epoch_ms(first_ts)) AS BIGINT)
         |    AS total_span_ms
         |FROM txns
         |GROUP BY n_events""".stripMargin
  )
}
