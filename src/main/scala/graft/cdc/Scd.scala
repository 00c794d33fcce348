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

  /** SCD2 intervals over an event frame: collapse consecutive events
    * with the same `event_type` per user (run-length encoding via lag),
    * then close each run with the next run's start (lead). Deterministic
    * order: (ts, event_id) — event_id is unique, so ties are broken.
    * Shared by [[qScd2]] and the point-in-time join.
    */
  private[cdc] def scd2Intervals(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull ||
        col("event_type") =!= col("prev_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  private def qScd2(s: SparkSession, d: String): DataFrame =
    scd2Intervals(Tables.events(s, d))

  /** The interval construction as reusable CTEs ending in `scd`
    * (user_id, event_type, valid_from, valid_to) — the ONE copy both
    * oracle twins build on.
    */
  private val scdSqlCtes: String =
    """chg AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |cp AS (
      |  SELECT user_id, ts, event_id, event_type FROM chg
      |  WHERE prev_type IS NULL OR event_type <> prev_type),
      |scd AS (
      |  SELECT user_id, event_type, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS valid_to
      |  FROM cp)""".stripMargin

  private val qScd2Sql: String =
    s"""WITH $scdSqlCtes
       |SELECT user_id, event_type, valid_from, valid_to,
       |  valid_to IS NULL AS is_current
       |FROM scd""".stripMargin

  // ------------------------------------------------------ q_point_in_time
  /** Point-in-time (temporal) join — the no-leakage feature-generation
    * primitive: for each daily cutoff, the SCD2 state that was valid
    * AT that instant (`valid_from <= cutoff < valid_to`, open interval
    * current). Training pipelines snapshot features this way so a
    * model never sees attribute values from after its label's
    * timestamp.
    *
    * Scale: the cutoff grid is CONSTANT-size → '''broadcast''' — the
    * join is map-only over the interval frame, riding the exchange
    * scd2 already made; output scales with intervals × avg days
    * spanned. With dense cutoff grids (minutes, not days) the move is
    * an as-of join per cutoff instead of interval × grid expansion —
    * q_asof has that shape.
    */
  private def qPointInTime(s: SparkSession, d: String): DataFrame = {
    val cutoffs = s.range(1).select(explode(sequence(
      lit("2024-01-02 00:00:00").cast("timestamp"),
      lit("2024-01-31 00:00:00").cast("timestamp"),
      expr("INTERVAL 1 DAY"))).as("cutoff"))
    scd2Intervals(Tables.events(s, d))
      .join(broadcast(cutoffs),
        col("valid_from") <= col("cutoff") &&
          (col("valid_to").isNull || col("cutoff") < col("valid_to")))
      .select(col("user_id"), col("cutoff"),
        col("event_type").as("state_type"), col("valid_from"))
  }

  private val qPointInTimeSql: String =
    s"""WITH $scdSqlCtes,
       |cutoffs AS (
       |  SELECT CAST(unnest(generate_series(
       |    TIMESTAMP '2024-01-02 00:00:00',
       |    TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 DAY)) AS TIMESTAMP)
       |    AS cutoff)
       |SELECT s.user_id, c.cutoff, s.event_type AS state_type,
       |  s.valid_from
       |FROM scd s JOIN cutoffs c
       |  ON s.valid_from <= c.cutoff
       | AND (s.valid_to IS NULL OR c.cutoff < s.valid_to)""".stripMargin

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

  // --------------------------------------------------------- q_snapshot_diff
  /** Changeset between two point-in-time snapshots — the "what changed
    * between T1 and T2" CDC diff a mirror consumer runs to reconcile:
    * latest-state per user as of [[DIFF_T1]] vs as of [[DIFF_T2]],
    * full-outer joined and classified INSERT (key only after),
    * UPDATE (both, different last event) or DELETE-candidate (key
    * only before — impossible with append-only events, included for
    * the general contract). NO-OPs (same last event) are filtered —
    * the changeset carries only real changes.
    *
    * Scale: two filtered `max_by` aggregations over the same scan —
    * both shuffles key on user_id, so the outer join that follows
    * reuses the partitioning (one Exchange per side, join co-located).
    * The changeset is bounded by keys-that-changed, not by event
    * volume — the property that makes snapshot diffs shippable.
    */
  private val DIFF_T1 = "2024-01-15"
  private val DIFF_T2 = "2024-02-01"

  private def qSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    def snap(cut: String, pfx: String): DataFrame =
      graft.Tables.events(s, d)
        .filter(col("ts") < lit(cut))
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("event_id"), col("event_type")),
          struct(col("ts"), col("event_id"))).as("s"))
        .select(col("user_id"),
          col("s.event_id").as(s"${pfx}_event_id"),
          col("s.event_type").as(s"${pfx}_type"))
    snap(DIFF_T1, "old").join(snap(DIFF_T2, "new"), Seq("user_id"),
        "full_outer")
      .withColumn("op",
        when(col("old_event_id").isNull, lit("INSERT"))
          .when(col("new_event_id").isNull, lit("DELETE"))
          .when(col("old_event_id") =!= col("new_event_id"), lit("UPDATE")))
      .filter(col("op").isNotNull)
      .select(col("user_id"), col("op"),
        col("old_event_id"), col("old_type"),
        col("new_event_id"), col("new_type"))
  }

  private val qSnapshotDiffSql: String =
    s"""WITH so AS (
       |  SELECT user_id, event_id AS old_event_id,
       |    event_type AS old_type FROM (
       |    SELECT user_id, event_id, event_type,
       |      row_number() OVER (PARTITION BY user_id
       |                         ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts < TIMESTAMP '$DIFF_T1')
       |  WHERE rn = 1),
       |sn AS (
       |  SELECT user_id, event_id AS new_event_id,
       |    event_type AS new_type FROM (
       |    SELECT user_id, event_id, event_type,
       |      row_number() OVER (PARTITION BY user_id
       |                         ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts < TIMESTAMP '$DIFF_T2')
       |  WHERE rn = 1),
       |j AS (
       |  SELECT coalesce(so.user_id, sn.user_id) AS user_id,
       |    so.old_event_id, so.old_type, sn.new_event_id, sn.new_type,
       |    CASE WHEN so.old_event_id IS NULL THEN 'INSERT'
       |         WHEN sn.new_event_id IS NULL THEN 'DELETE'
       |         WHEN so.old_event_id <> sn.new_event_id THEN 'UPDATE'
       |    END AS op
       |  FROM so FULL OUTER JOIN sn ON sn.user_id = so.user_id)
       |SELECT user_id, op, old_event_id, old_type, new_event_id, new_type
       |FROM j WHERE op IS NOT NULL""".stripMargin

  // --------------------------------------------------------------- q_merge
  /** MERGE INTO — the sink-side upsert a CDC mirror applies per batch
    * (the lakehouse statement `MERGE INTO base USING batch ON key WHEN
    * MATCHED [AND is_delete] THEN DELETE / UPDATE WHEN NOT MATCHED
    * THEN INSERT`), expressed as the full-outer-join rewrite every
    * engine lowers MERGE to. Base = last-writer-wins state before
    * [[DIFF_T1]]; batch = the changes since, COMPACTED to one action
    * per key FIRST (`max_by` on (ts, event_id)) — the discipline that
    * makes MERGE deterministic when a batch carries multiple writes
    * for one key (SQL MERGE errors on duplicate matches; compaction
    * is what production CDC appliers do instead). A final `error`
    * event is the delete marker; anything else upserts. Every
    * surviving row carries its action (`kept`/`updated`/`inserted`)
    * — the audit column a MERGE metrics sink reports.
    *
    * Scale: two `max_by` compactions (map-side partials) + ONE
    * key-keyed full outer join; both sides hash on user_id so the
    * join reuses the agg exchanges — the whole statement is one
    * shuffle per side regardless of event volume, and the output is
    * keys, not events. Deletes drop rows; nothing re-reads the base
    * twice (the anti-join + union MERGE rewrite would).
    */
  private def qMerge(s: SparkSession, d: String): DataFrame = {
    def lww(df: DataFrame, pfx: String): DataFrame = df
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("event_id"), col("ts"), col("event_type"),
        col("value")), struct(col("ts"), col("event_id"))).as("s"))
      .select(col("user_id"),
        col("s.event_id").as(s"${pfx}_event_id"),
        col("s.ts").as(s"${pfx}_ts"),
        col("s.event_type").as(s"${pfx}_type"),
        col("s.value").as(s"${pfx}_value"))
    val ev = graft.Tables.events(s, d)
    val base = lww(ev.filter(col("ts") < lit(DIFF_T1)), "base")
    val batch = lww(ev.filter(col("ts") >= lit(DIFF_T1)), "b")
    base.join(batch, Seq("user_id"), "full_outer")
      .filter(col("b_type").isNull || col("b_type") =!= "error")
      .withColumn("action",
        when(col("b_event_id").isNull, lit("kept"))
          .when(col("base_event_id").isNull, lit("inserted"))
          .otherwise(lit("updated")))
      .select(col("user_id"),
        coalesce(col("b_event_id"), col("base_event_id")).as("event_id"),
        coalesce(col("b_ts"), col("base_ts")).as("ts"),
        coalesce(col("b_type"), col("base_type")).as("event_type"),
        coalesce(col("b_value"), col("base_value")).as("value"),
        col("action"))
  }

  private val qMergeSql: String =
    s"""WITH base AS (
       |  SELECT user_id, event_id, ts, event_type, value FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id
       |                                 ORDER BY ts DESC, event_id DESC)
       |      AS rn
       |    FROM events WHERE ts < TIMESTAMP '$DIFF_T1')
       |  WHERE rn = 1),
       |batch AS (
       |  SELECT user_id, event_id, ts, event_type, value FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id
       |                                 ORDER BY ts DESC, event_id DESC)
       |      AS rn
       |    FROM events WHERE ts >= TIMESTAMP '$DIFF_T1')
       |  WHERE rn = 1)
       |SELECT coalesce(base.user_id, batch.user_id) AS user_id,
       |  coalesce(batch.event_id, base.event_id) AS event_id,
       |  coalesce(batch.ts, base.ts) AS ts,
       |  coalesce(batch.event_type, base.event_type) AS event_type,
       |  coalesce(batch.value, base.value) AS value,
       |  CASE WHEN batch.event_id IS NULL THEN 'kept'
       |       WHEN base.event_id IS NULL THEN 'inserted'
       |       ELSE 'updated' END AS action
       |FROM base FULL OUTER JOIN batch ON batch.user_id = base.user_id
       |WHERE batch.event_type IS NULL OR batch.event_type <> 'error'"""
      .stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2"          -> (qScd2 _),
    "q_latest_state"  -> (qLatestState _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_point_in_time" -> (qPointInTime _),
    "q_merge"         -> (qMerge _)
  )

  val oracles: Map[String, String] = Map(
    "q_scd2"          -> qScd2Sql,
    "q_latest_state"  -> qLatestStateSql,
    "q_snapshot_diff" -> qSnapshotDiffSql,
    "q_point_in_time" -> qPointInTimeSql,
    "q_merge"         -> qMergeSql
  )
}
