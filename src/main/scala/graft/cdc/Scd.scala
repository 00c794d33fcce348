package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal materializations of a change stream — the two standard
  * downstream shapes a CDC consumer builds from the event log the
  * reference emits (cdc-via-flink's reconstructed transactions feed
  * exactly this kind of table maintenance; see
  * `DebeziumTransactionReconstructor.java` for the upstream producer):
  *
  *  - '''SCD Type 2''' ([[qScd2]]): one validity interval per attribute
  *    change, `valid_from`/`valid_to`/`is_current` — the
  *    slowly-changing-dimension history table.
  *  - '''Latest-state snapshot''' ([[qLatestState]]): last-writer-wins
  *    compaction to one current row per key — the materialized view a
  *    CDC mirror maintains.
  *
  * Scale: both are a single hash exchange on the entity key.
  * The snapshot is a `max_by` aggregation (map-side partial combine —
  * each task reduces its local events to one candidate per key before
  * the shuffle, so the exchange carries ≤ one row per (task, key),
  * not the event log). SCD2 needs the full per-key history ordered, so
  * it is two window passes over one Exchange — the minimum for
  * interval construction.
  */
object Scd {

  /** SCD2 intervals over the event stream: collapse consecutive events
    * with the same `event_type` per user (run-length encoding via lag),
    * then close each run with the next run's start (lead). Deterministic
    * order: (ts, event_id) — event_id is unique, so ties are broken.
    */
  private def qScd2(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull ||
        col("event_type") =!= col("prev_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  private val qScd2Sql: String =
    """WITH chg AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |cp AS (
      |  SELECT user_id, ts, event_id, event_type FROM chg
      |  WHERE prev_type IS NULL OR event_type <> prev_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS valid_to,
      |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
      |    AS is_current
      |FROM cp""".stripMargin

  /** Last-writer-wins snapshot: the latest event per user by
    * (ts, event_id). Spark side is ONE `max_by` aggregation (struct
    * ordering key → lexicographic (ts, event_id), partials combined
    * map-side); the oracle is the equivalent row_number()=1 form —
    * same rows because the ordering key is unique per user.
    */
  private def qLatestState(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("ts"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("s"))
      .select(col("user_id"),
        col("s.event_id").as("last_event_id"),
        col("s.ts").as("last_ts"),
        col("s.event_type").as("last_type"),
        col("s.value").as("last_value"))

  private val qLatestStateSql: String =
    """WITH r AS (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |  event_type AS last_type, value AS last_value
      |FROM r WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2"         -> (qScd2 _),
    "q_latest_state" -> (qLatestState _)
  )

  val oracles: Map[String, String] = Map(
    "q_scd2"         -> qScd2Sql,
    "q_latest_state" -> qLatestStateSql
  )
}
