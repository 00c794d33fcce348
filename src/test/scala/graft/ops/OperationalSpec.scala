package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.functions._

/** Specs for the operational module: properties the DuckDB oracle
  * cannot express — plan shape (no multi-distinct Expand), internal
  * consistency (histogram counts sum to the table count), and
  * result-equality of the incremental/salted constructions against
  * their direct formulations computed in the SAME engine.
  */
class OperationalSpec extends SparkSpec {

  test("q_profile plans without a multi-distinct Expand") {
    val df = SparkEntry.queries("q_profile")(spark, sf())
    val expands = df.queryExecution.executedPlan.collect {
      case e: ExpandExec => e
    }
    assert(expands.isEmpty,
      "profile must run one single-distinct agg per column, not one " +
        "multi-distinct agg through Expand")
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getAs[Long]("n_distinct") > 0))
    assert(rows.forall(r => r.getAs[Long]("n_null") == 0L))
  }

  test("q_histogram buckets are clamped and counts sum to the table") {
    val hist = SparkEntry.queries("q_histogram")(spark, sf()).collect()
    assert(hist.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 19
    })
    val total = hist.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, sf()).count())
  }

  test("q_incr_agg partial-merge equals the direct aggregation") {
    val incr = SparkEntry.queries("q_incr_agg")(spark, sf())
    val direct = Tables.orders(spark, sf())
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
          .as("total_price"))
    assert(incr.exceptAll(direct).isEmpty && direct.exceptAll(incr).isEmpty)
  }

  test("q_funnel stages partition the viewing users") {
    val rows = SparkEntry.queries("q_funnel")(spark, sf()).collect()
    assert(rows.forall { r =>
      val s = r.getAs[Int]("funnel_stage"); s >= 1 && s <= 3
    })
    val nViewers = Tables.events(spark, sf())
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nViewers)
  }

  test("q_cohort: offset-0 diagonal covers every user exactly once") {
    val rows = SparkEntry.queries("q_cohort")(spark, sf()).collect()
    assert(rows.forall(_.getAs[Int]("day_offset") >= 0))
    val diag = rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(_.getAs[Long]("n_active")).sum
    val nUsers = Tables.events(spark, sf())
      .select(col("user_id")).distinct().count()
    assert(diag == nUsers, "every user is active on their cohort day")
  }

  test("q_anomaly flags only values beyond 3 standard deviations") {
    val rows = SparkEntry.queries("q_anomaly")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("value") - r.getAs[Double]("mean"))
        > 3.0 * r.getAs[Double]("sd"))
    }
  }

  test("q_skew_join equals the plain join rollup") {
    val salted = SparkEntry.queries("q_skew_join")(spark, sf())
    val plain = Tables.lineitem(spark, sf())
      .join(Tables.supplier(spark, sf()),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q_changepoint equals the Scala-side CUSUM argmax") {
    val daily = Tables.events(spark, sf())
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)")
        .as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (tpe, rows) =>
      val xs = rows.sortBy(_._2.toEpochDay).map(r => (r._2, r._3))
      val total = BigInt(xs.map(_._2).sum)
      val n = BigInt(xs.length)
      var prefix = BigInt(0)
      val scored = xs.zipWithIndex.dropRight(1).map { case ((day, x), i) =>
        prefix += x
        (day, i + 1, n * prefix - BigInt(i + 1) * total)
      }
      val (day, idx, s) =
        scored.maxBy { case (d, _, sv) => (sv.abs, -d.toEpochDay) }
      // s >= 0 ⇒ pre-segment above the overall mean ⇒ level steps DOWN
      (tpe, day, idx, xs.length,
        if (s >= 0) "down" else "up", (s.abs / 10000).toLong)
    }.toSet
    val got = SparkEntry.queries("q_changepoint")(spark, sf())
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getInt(2),
        r.getInt(3), r.getString(4), r.getLong(5)))
      .toSet
    assert(got == expected)
  }
}
