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
}
