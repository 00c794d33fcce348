package graft.cdc

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the SCD2 / latest-state CDC materializations
  * (the oracle gate checks cross-engine equality; these check meaning
  * on a hand-built change history).
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // A controlled event log written as an `events` table: user 1 runs
  // A, A, B (the repeat must collapse), user 2 has a single C.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("scd-spec").toString
    Seq(
      (10L, ts(1), 1L, "A", 1.0, "{}"),
      (11L, ts(2), 1L, "A", 2.0, "{}"),
      (12L, ts(3), 1L, "B", 3.0, "{}"),
      (20L, ts(5), 2L, "C", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("scd2: consecutive same-type events collapse into one interval") {
    val rows = Scd.queries("q_scd2")(spark, dir)
      .orderBy("user_id", "valid_from")
      .collect()
    assert(rows.length == 3)
    val u1 = rows.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("A", "B"))
    // A's interval is closed by B's start, not by the second A event
    assert(u1(0).getTimestamp(3) == ts(3))
    assert(!u1(0).getBoolean(4)) // A is history
    assert(u1(1).getTimestamp(3) == null && u1(1).getBoolean(4)) // B current
  }

  test("scd2: intervals tile — every change point starts where the previous ended") {
    val df = Scd.queries("q_scd2")(spark, sf())
    // No interval may end before it starts, and per user exactly one
    // current row with NULL valid_to.
    assert(df.filter(col("valid_to") < col("valid_from")).count() == 0)
    val cur = df.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
      .filter(col("n") =!= 1)
    assert(cur.count() == 0)
    // The actual tiling property: each interval's valid_to equals the
    // NEXT interval's valid_from (no gaps, no overlaps) — the invariant
    // the lead() closing logic exists to provide.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("valid_from"))
    val untiled = df
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to") =!= col("next_from"))
    assert(untiled.count() == 0)
  }

  test("point-in-time: each cutoff sees the state valid at that instant") {
    val pit = Scd.queries("q_point_in_time")(spark, dir).collect()
    // controlled log: user 1 is B from 00:03 on, user 2 is C from
    // 00:05 — every one of the 30 daily cutoffs (Jan 2..31) sees that
    assert(pit.length == 60)
    assert(pit.filter(_.getLong(0) == 1L).forall(_.getString(2) == "B"))
    assert(pit.filter(_.getLong(0) == 2L).forall(_.getString(2) == "C"))
  }

  test("point-in-time: at most one state per (user, cutoff)") {
    val df = Scd.queries("q_point_in_time")(spark, sf())
    assert(df.groupBy("user_id", "cutoff").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("latest state: one row per user, the max (ts, event_id) event") {
    val rows = Scd.queries("q_latest_state")(spark, dir)
      .orderBy("user_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 12L && rows(0).getString(3) == "B")
    assert(rows(1).getLong(1) == 20L && rows(1).getString(3) == "C")
  }

  test("merge: upsert/delete/keep semantics on a controlled batch") {
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val d = Files.createTempDirectory("merge-spec").toString
    Seq(
      (10L, t(10), 1L, "A", 1.0, "{}"),      // base, updated by batch
      (11L, t(20), 1L, "B", 2.0, "{}"),
      (20L, t(10), 2L, "C", 3.0, "{}"),      // base, deleted by batch
      (21L, t(21), 2L, "error", 0.0, "{}"),
      (30L, t(12), 3L, "D", 4.0, "{}"),      // base only → kept
      (40L, t(22), 4L, "E", 5.0, "{}"),      // batch only → inserted
      (50L, t(23), 5L, "error", 0.0, "{}"),  // delete of absent key → no-op
      (60L, t(20), 6L, "F", 6.0, "{}"),      // batch-internal compaction:
      (61L, t(25), 6L, "G", 7.0, "{}")       //   last write G wins
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = Scd.queries("q_merge")(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(3), r.getString(5)))).toMap
    assert(got.keySet == Set(1L, 3L, 4L, 6L))
    assert(got(1L) == ((11L, "B", "updated")))
    assert(got(3L) == ((30L, "D", "kept")))
    assert(got(4L) == ((40L, "E", "inserted")))
    assert(got(6L) == ((61L, "G", "inserted")))
  }

  test("merge: actions reconcile with base/batch key sets on the corpus") {
    val ev = graft.Tables.events(spark, sf())
    val baseKeys = ev.filter(col("ts") < lit("2024-01-15"))
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val batchLast = ev.filter(col("ts") >= lit("2024-01-15"))
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"),
        struct(col("ts"), col("event_id"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Scd.queries("q_merge")(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    rows.foreach { case (u, action) =>
      action match {
        case "kept" =>
          assert(baseKeys.contains(u) && !batchLast.contains(u))
        case "updated" =>
          assert(baseKeys.contains(u) && batchLast(u) != "error")
        case "inserted" =>
          assert(!baseKeys.contains(u) && batchLast(u) != "error")
      }
    }
    val expectedKeys = baseKeys.filter(u =>
      batchLast.get(u).forall(_ != "error")) ++
      batchLast.filter(_._2 != "error").keySet
    assert(rows.keySet == expectedKeys)
  }
}
