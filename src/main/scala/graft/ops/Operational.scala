package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational / data-management queries: column profiling, histogram
  * sketching, incremental aggregate maintenance, and the oracle-gated
  * face of the salted skew join.
  *
  * Reference provenance: the reference engine has no operational
  * surface (`/root/reference/readme.md:1-5`); these are the
  * table-health and maintenance passes a 100 TB warehouse runs
  * continuously (profile on ingest, histograms for the optimizer /
  * dashboards, incremental aggregate refresh instead of full
  * recompute).
  */
object Operational {

  // -------------------------------------------------------------- q_profile
  /** Column profiling — per column: row count, null count, exact
    * distinct count, min and max (as strings for a uniform row shape).
    * The ingest-time data-quality pass of a lakehouse.
    *
    * Scale: ONE single-distinct aggregation per column, unioned.
    * Deliberately NOT one aggregation with N `count_distinct`s —
    * multi-distinct plans through Catalyst's Expand, which replicates
    * every input row N× before the shuffle (the q_join_star lesson).
    * Per-column passes each read exactly one parquet column
    * (`ReadSchema` pruned to it) and plan as the two-stage
    * partial-distinct HashAggregate — each pass shuffles only that
    * column's distinct values. The profiled column set is metadata,
    * so the union width is fixed; the passes are independent and
    * scan-bound, and on a cluster they run concurrently.
    *
    * Only BIGINT and VARCHAR columns are profiled with min/max (their
    * string casts are identical across engines; double/timestamp
    * formatting is not — those columns get profiled by [[qHistogram]]
    * instead).
    */
  private val profileCols =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
      "l_linestatus")

  private def qProfile(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    profileCols.map { c =>
      li.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionAll(_))
  }

  private val qProfileSql: String =
    profileCols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")

  // ------------------------------------------------------------ q_histogram
  /** Equi-width histogram of `events.value` per event type: bucket =
    * floor(value / 5) clamped to [0, 19], with bucket bounds and both
    * count and an exact decimal-routed sum per bucket — the
    * numeric-column profile for dashboards and optimizer statistics.
    *
    * Cross-engine exactness: `value / 5.0` and `floor` are single
    * IEEE-754 operations — bit-identical in Spark and DuckDB — and the
    * bucket arithmetic after that is integer. The per-bucket sum runs
    * in DECIMAL(18,4) (order-independent), surfaced as double.
    *
    * Scale: map-only bucket assignment, one hash aggregation keyed
    * (event_type, bucket) — the group count is types × 20 regardless
    * of corpus size, so partial aggregation collapses nearly all rows
    * map-side. No window, no join.
    */
  private val BUCKET_W = 5.0
  private val N_BUCKETS = 20

  private def qHistogram(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), col("value"))
      .withColumn("bucket",
        least(greatest(floor(col("value") / BUCKET_W), lit(0L)),
          lit(N_BUCKETS - 1L)).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(col("event_type"), col("bucket"),
        (col("bucket") * BUCKET_W).as("lo"),
        ((col("bucket") + 1) * BUCKET_W).as("hi"),
        col("n"), col("sum_value"))

  private val qHistogramSql: String =
    s"""WITH b AS (
       |  SELECT event_type,
       |    CAST(least(greatest(floor(value / $BUCKET_W), 0),
       |               ${N_BUCKETS - 1}) AS BIGINT) AS bucket,
       |    value
       |  FROM events)
       |SELECT event_type, bucket,
       |  bucket * $BUCKET_W AS lo,
       |  (bucket + 1) * $BUCKET_W AS hi,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       |FROM b GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- q_incr_agg
  /** Incremental aggregate maintenance: the corpus is split into a
    * BASE shard (orders before 1995) and a DELTA shard (1995 on); each
    * is reduced to algebraic partials (count, decimal sum) per
    * priority, and the merge combines partial states only — the
    * refresh pattern where the base partials are a materialized
    * aggregate table read back at delta time, so a daily refresh scans
    * ONLY the delta.
    *
    * The result is proven identical to the full recompute by the
    * oracle, which aggregates the unsplit table directly. Works for
    * any algebraic aggregate (sum/count/min/max and anything built
    * from them, e.g. avg = merged sum / merged count); exact distinct
    * is NOT algebraic — at scale that column maintains a sketch (HLL)
    * or a distinct-keyed sub-aggregate instead.
    *
    * Scale: two narrow aggregations (delta-sized and aggregate-table-
    * sized) + a merge keyed on the group key, whose cardinality is the
    * group count, not the row count. At 100 TB with daily deltas this
    * turns an O(corpus) refresh into O(delta + groups).
    */
  private val SPLIT_DATE = "1995-01-01"

  private def qIncrAgg(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,4)").as("p"))
    def partials(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("pn"), sum(col("p")).as("pp"))
    val base  = partials(orders.filter(col("o_orderdate") < lit(SPLIT_DATE)))
    val delta = partials(orders.filter(col("o_orderdate") >= lit(SPLIT_DATE)))
    base.unionAll(delta)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("pn")).as("n_orders"),
        sum(col("pp")).cast("double").as("total_price"))
  }

  private val qIncrAggSql: String =
    s"""SELECT o_orderpriority,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
       |    AS total_price
       |FROM orders
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------ q_skew_join
  /** The salted skew join ([[Skew.saltedJoin]]) as an oracle-gated
    * query: lineitem ⋈ supplier through the salted construction, then
    * a per-nation rollup. The oracle runs the PLAIN join + the same
    * rollup — green means the salt changed the task layout and nothing
    * else.
    *
    * Scale: the dim side replicates `buckets`× (supplier is dimension-
    * sized), the fact side's hot key now lands on `buckets` tasks. The
    * rollup's decimal sum keeps the comparison exact.
    */
  private def qSkewJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_quantity"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey", buckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
  }

  private val qSkewJoinSql: String =
    """SELECT s_nationkey,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile"   -> qProfile _,
    "q_histogram" -> qHistogram _,
    "q_incr_agg"  -> qIncrAgg _,
    "q_skew_join" -> qSkewJoin _
  )

  val oracles: Map[String, String] = Map(
    "q_profile"   -> qProfileSql,
    "q_histogram" -> qHistogramSql,
    "q_incr_agg"  -> qIncrAggSql,
    "q_skew_join" -> qSkewJoinSql
  )
}
