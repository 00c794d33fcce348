package graft.ops

import graft.{Det, Tables}
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

  // ------------------------------------------------------------ q_incr_join
  /** Incremental maintenance of a JOIN view — the two-sided extension
    * of [[qIncrAgg]]: the materialized view V = orders ⋈ lineitem
    * aggregated to per-priority (item count, decimal quantity sum),
    * refreshed after BOTH tables grow. With ΔO/ΔL the post-
    * [[SPLIT_DATE]] arrivals, the delta of the join is the standard
    * IVM expansion
    *   ΔV = ΔO⋈L₀ ∪ O₀⋈ΔL ∪ ΔO⋈ΔL
    * (each pair shows up in exactly one term), reduced to algebraic
    * partials and merged with the base view's partials on the group
    * key. The oracle is the full recompute — green means the
    * incremental expansion lost and double-counted nothing.
    *
    * Scale: the refresh touches base tables only against a DELTA
    * (ΔO⋈L₀ and O₀⋈ΔL join a day's arrivals against the corpus —
    * keyed on the join key, so with the base tables bucketed on
    * orderkey (BucketingSpec's layout) the big side never reshuffles;
    * ΔO⋈ΔL is delta×delta). Partials collapse map-side; the final
    * merge is group-count-sized. O(delta + groups) per refresh
    * instead of O(corpus) — the join-view analog of q_incr_agg,
    * closing the gap its scaladoc left ("non-algebraic distinct is
    * sketch territory"; joins are THIS territory).
    */
  private def qIncrJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"),
        col("l_quantity").cast("decimal(18,4)").as("q"))
    val ob = o.filter(col("o_orderdate") < lit(SPLIT_DATE))
    val od = o.filter(col("o_orderdate") >= lit(SPLIT_DATE))
    val lb = l.filter(col("l_shipdate") < lit(SPLIT_DATE))
    val ld = l.filter(col("l_shipdate") >= lit(SPLIT_DATE))
    def partials(oSide: DataFrame, lSide: DataFrame): DataFrame =
      oSide.join(lSide, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("pn"), sum(col("q")).as("pq"))
    Seq(partials(ob, lb), partials(od, lb), partials(ob, ld),
        partials(od, ld))
      .reduce(_.unionAll(_))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("pn")).as("n_items"),
        sum(col("pq")).cast("double").as("sum_qty"))
  }

  private val qIncrJoinSql: String =
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |    AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
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

  // -------------------------------------------------------------- q_funnel
  /** Ordered funnel analysis over the event stream — per user, the
    * furthest stage reached through view → click → purchase where
    * each stage must occur strictly AFTER the previous one (min
    * qualifying timestamp per stage), then users per stage. The
    * product-analytics query every event warehouse serves.
    *
    * Scale: three aggregations keyed on user_id — the first computes
    * per-user first-view from the scan; each later stage joins the
    * previous stage's (user, ts) frame back to the events co-
    * partitioned on user_id, so after the first exchange on user_id
    * the whole funnel stays in one partitioning (Exchange reuse). No
    * window over the raw stream, no per-user sort.
    */
  private def qFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    val staged = v
      .join(c.select(col("user_id"), lit(1).as("hc")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("hp")), Seq("user_id"), "left")
      .select(
        (lit(1) + coalesce(col("hc"), lit(0)) + coalesce(col("hp"), lit(0)))
          .as("funnel_stage"))
    staged.groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  private val qFunnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
      |SELECT 1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
      |    AS funnel_stage,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM v
      |LEFT JOIN c ON c.user_id = v.user_id
      |LEFT JOIN p ON p.user_id = v.user_id
      |GROUP BY 1""".stripMargin

  // -------------------------------------------------------------- q_cohort
  /** Retention cohort matrix: users are cohorted by first-seen day;
    * each (cohort_day, day_offset) cell counts the cohort's users
    * active that many days later. The other standard event-warehouse
    * rollup next to [[qFunnel]].
    *
    * Scale: first-seen is one min-aggregation on user_id; the
    * activity join is co-partitioned on user_id (Exchange reuse with
    * the first agg); the final matrix groups on (cohort_day, offset)
    * whose cardinality is days², so partials collapse map-side. The
    * distinct-user count inside each cell dedupes (user, day) pairs
    * BEFORE the matrix agg — one extra narrow aggregation instead of
    * a count_distinct Expand.
    */
  private def qCohort(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val active = ev.distinct()
      .join(first, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
    active.groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  private val qCohortSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |first AS (
      |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
      |SELECT f.cohort_day,
      |  CAST(date_diff('day', f.cohort_day, e.day) AS INTEGER) AS day_offset,
      |  CAST(count(*) AS BIGINT) AS n_active
      |FROM ev e JOIN first f ON f.user_id = e.user_id
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- q_anomaly
  /** 3σ outlier detection per event type: events whose value deviates
    * from their type's mean by more than three standard deviations.
    * Mean/stddev come from exact decimal component sums converted
    * through the scaled-BIGINT route (see q_stats — both engines then
    * share one rounding sequence), so the flag boundary is
    * bit-identical and the flagged set reproduces exactly.
    *
    * Scale: the stats frame is one aggregation with group count =
    * #event types → '''broadcast''' back onto the scan; the flagging
    * pass is map-only. The 100 TB shape for any rule-based
    * data-quality monitor.
    */
  private def qAnomaly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def viaScaledLong(c: org.apache.spark.sql.Column) =
      graft.Det.stableDouble(c)
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).as("sxd"),
        sum(col("value").cast(DecimalType(12, 2))
          * col("value").cast(DecimalType(12, 2))).as("sxxd"))
      .select(col("event_type"), col("n"),
        viaScaledLong(col("sxd")).as("sx"),
        viaScaledLong(col("sxxd")).as("sxx"))
      .select(col("event_type"),
        (col("sx") / col("n")).as("mean"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
          / (col("n") - 1)).as("sd"))
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(abs(col("value") - col("mean")) > lit(3.0) * col("sd"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("mean"), col("sd"))
  }

  private val qAnomalySql: String =
    """WITH s AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
      |      AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))
      |             * CAST(value AS DECIMAL(12,2)))
      |      AS VARCHAR) AS DOUBLE) AS sxx
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT event_type, sx / n AS mean,
      |    sqrt((sxx - sx * sx / n) / (n - 1)) AS sd
      |  FROM s)
      |SELECT e.event_id, e.event_type, e.value, st.mean, st.sd
      |FROM events e JOIN st ON st.event_type = e.event_type
      |WHERE abs(e.value - st.mean) > 3.0 * st.sd""".stripMargin

  // -------------------------------------------------------------- q_basket
  /** Market-basket association rules over parts bought together:
    * for each part pair co-occurring in ≥ [[BASKET_MIN]] orders,
    * integer-exact scaled support (⌊c_ab·10⁶/N⌋), confidence a→b
    * (⌊c_ab·10⁶/c_a⌋), and lift (⌊c_ab·N·10⁶/(c_a·c_b)⌋) — the
    * retail-analytics cousin of q_cooccur's PMI, framed on
    * transactions with the standard rule metrics. Top-25 rules by
    * (lift, pair).
    *
    * Scale: pair counts come from one within-order self-join of the
    * distinct (order, part) frame — the join key is the order id, so
    * work scales with Σ basket_size², not orders × parts; item counts
    * and the N scalar are item-catalog-sized → '''broadcast'''. The
    * top-25 is TakeOrderedAndProject.
    *
    * Mega-basket guard (the q_ts_pairs discipline, declarative form):
    * Σ basket² is unbounded in the largest basket — ONE pathological
    * transaction of 10⁶ items at warehouse scale contributes 10¹²
    * pairs and sinks the join. Baskets larger than
    * [[BASKET_MAX_ITEMS]] are excluded from the TRANSACTION UNIVERSE
    * (semi-join on basket size ≤ cap, mirrored in the oracle) before
    * any metric — N, item counts, and pairs all see the same filtered
    * set, so support/confidence/lift stay mutually consistent.
    * Dropping degenerate transactions is standard association-mining
    * practice (a crawl artifact carries no basket signal); the cap
    * bounds per-basket pair work at ~2²⁰. The guard's cost model
    * rides on mega-baskets being RARE BY DEFINITION (they are the
    * pathology, not the population): basket sizes aggregate map-side
    * to an orders-scale count frame, only the OVERSIZED keys survive
    * the filter (an empty-to-tiny frame at any realistic scale), and
    * the exclusion is a '''broadcast''' left-anti join — the base
    * plan's exchanges are untouched (measured at sf1: a groupBy+
    * semi-join guard added two corpus-scale exchanges, +85% warm; a
    * count-window guard added a corpus-scale sort, +45%; the
    * broadcast anti form is within noise of the unguarded plan).
    */
  private val BASKET_MIN = 3
  private[graft] val BASKET_MAX_ITEMS = 1024

  /** Association rules over a distinct (l_orderkey, l_partkey) frame —
    * factored out of [[qBasket]] so the mega-basket guard is testable
    * on synthetic frames (see `BasketGuardSpec`).
    */
  private[graft] def basketRules(op0raw: DataFrame, minCount: Int,
      maxBasket: Int): DataFrame = {
    // The distinct (order, part) frame feeds SIX consumers (pair join
    // x/y, item counts, N, and the guard's size agg) — per-branch
    // filter pushdown makes their subtrees canonically different, so
    // exchange reuse never fires and each consumer re-scans and
    // re-distincts the corpus (measured at sf1: 3 full lineitem
    // scans). Checkpoint it ONCE per invocation (the q_ts_pairs
    // discipline; at warehouse scale this frame is the materialized
    // transaction table a basket job writes first).
    val op0 = op0raw.transform(graft.Memo.checkpoint)
    // One basket-size frame serves BOTH the guard (oversized keys →
    // broadcast anti) and the transaction count N (surviving rows) —
    // the separate distinct-orderkey count pass the unguarded plan
    // paid for N disappears, so the guard is net-free.
    val sizes = op0.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("bsz"))
    val mega = sizes.filter(col("bsz") > maxBasket)
      .select(col("l_orderkey"))
    val op = op0.join(broadcast(mega), Seq("l_orderkey"), "left_anti")
    val n = sizes.filter(col("bsz") <= maxBasket)
      .agg(count(lit(1)).as("n"))
    val item = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val pairs = op.alias("x")
      .join(op.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("part_a"),
        col("y.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    pairs
      .join(broadcast(item.select(col("l_partkey").as("part_a"),
        col("c").as("c_a"))), Seq("part_a"))
      .join(broadcast(item.select(col("l_partkey").as("part_b"),
        col("c").as("c_b"))), Seq("part_b"))
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("c_ab"),
        expr("(c_ab * 1000000) div n").as("support_ppm"),
        expr("(c_ab * 1000000) div c_a").as("conf_ppm"),
        // DECIMAL(38,0) routing (the q_chi2 discipline): c_ab·N·10⁶ wraps
        // silently in BIGINT past the bench envelope while the oracle
        // errors — decimal holds to 38 digits on both engines.
        expr("CAST((CAST(c_ab AS DECIMAL(38,0)) * n * 1000000)" +
          " div (c_a * c_b) AS BIGINT)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("part_a"), col("part_b"))
      .limit(25)
  }

  private def qBasket(s: SparkSession, d: String): DataFrame =
    basketRules(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct(),
      BASKET_MIN, BASKET_MAX_ITEMS)

  private val qBasketSql: String =
    s"""WITH op0 AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |op AS MATERIALIZED (
       |  SELECT * FROM op0
       |  WHERE l_orderkey NOT IN (
       |    SELECT l_orderkey FROM op0
       |    GROUP BY 1 HAVING count(*) > $BASKET_MAX_ITEMS)),
       |n AS (
       |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
       |item AS (
       |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
       |  FROM op GROUP BY 1),
       |pairs AS (
       |  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
       |    CAST(count(*) AS BIGINT) AS c_ab
       |  FROM op x JOIN op y ON x.l_orderkey = y.l_orderkey
       |                     AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $BASKET_MIN)
       |SELECT p.part_a, p.part_b, p.c_ab,
       |  (p.c_ab * 1000000) // (SELECT n FROM n) AS support_ppm,
       |  (p.c_ab * 1000000) // a.c AS conf_ppm,
       |  CAST((CAST(p.c_ab AS HUGEINT) * (SELECT n FROM n) * 1000000)
       |       // (a.c * b.c) AS BIGINT) AS lift_ppm
       |FROM pairs p
       |JOIN item a ON a.l_partkey = p.part_a
       |JOIN item b ON b.l_partkey = p.part_b
       |ORDER BY lift_ppm DESC, part_a, part_b
       |LIMIT 25""".stripMargin

  // ----------------------------------------------------------------- q_mad
  /** Robust dispersion per event type: median and MAD (median absolute
    * deviation), plus the ±3·1.4826·MAD robust outlier thresholds —
    * the heavy-tail-safe complement of [[qAnomaly]]'s mean/σ rule
    * (one wild value moves a mean; it cannot move a median). Exact
    * interpolated medians via `percentile` ≡ DuckDB `quantile_cont`
    * (identical interpolation on identical doubles — the q_percentiles
    * discipline).
    *
    * Scale: two passes — per-type median, broadcast back, then the
    * deviation median. Exact per-group percentiles sort within the
    * group; at warehouse scale both passes switch to
    * `percentile_approx` (t-digest sketches, one pass, mergeable)
    * with the same query shape.
    */
  private def qMad(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("median"),
        expr("percentile(abs(value - med), 0.5)").as("mad"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("median"), col("mad"), col("n"),
        (col("median") + lit(3.0) * lit(1.4826) * col("mad"))
          .as("hi_threshold"),
        (col("median") - lit(3.0) * lit(1.4826) * col("mad"))
          .as("lo_threshold"))
  }

  private val qMadSql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT e.event_type, max(med.med) AS median,
      |    quantile_cont(abs(e.value - med.med), 0.5) AS mad,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events e JOIN med ON med.event_type = e.event_type
      |  GROUP BY 1)
      |SELECT event_type, median, mad, n,
      |  median + 3.0 * 1.4826 * mad AS hi_threshold,
      |  median - 3.0 * 1.4826 * mad AS lo_threshold
      |FROM m""".stripMargin

  // --------------------------------------------------------------- q_ewma
  /** Exponentially-decayed per-user engagement score — the recency
    * weighting behind session scoring, trending detection, and decayed
    * feature stores: for each event, a half-life-weighted sum of the
    * user's last 8 values, `ewma = Σ_{j=0..7} v_{t−j}·2^{7−j} / 255`.
    * Power-of-two weights make every multiply IEEE-EXACT and the
    * explicitly left-associated 8-term sum evaluates in the identical
    * order on both engines — bit-identical without any decimal
    * routing, and independent of partitioning (the lag frame fixes the
    * operand order, unlike a windowed SUM whose accumulation order is
    * engine-private). A time-decay (rather than count-decay) variant
    * swaps the lag chain for a ts-difference exponent.
    *
    * Scale: one window pass, ONE exchange on `user_id` (the sort
    * within partitions is linear after the shuffle). Bounded lookback
    * = bounded state: the same 8-lag chain runs streaming as a keyed
    * 8-element buffer ([[graft.streaming.StreamingTopK]] pattern).
    */
  private def qEwma(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val num = (0 to 7).map { j =>
      val v = if (j == 0) col("value") else lag(col("value"), j, 0.0).over(w)
      v * lit((1L << (7 - j)).toDouble)
    }.reduce(_ + _) // left fold ≡ SQL's left-associative `+` chain
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("ewma", num / lit(255.0))
  }

  private val qEwmaSql: String = {
    val terms = (0 to 7).map { j =>
      val v = if (j == 0) "value" else s"lag(value, $j, 0.0) OVER w"
      s"$v * ${(1L << (7 - j)).toDouble}"
    }.mkString(" + ")
    s"""SELECT user_id, event_id, ts, value, ($terms) / 255.0 AS ewma
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
  }

  // ------------------------------------------------------- q_attribution
  /** First-touch attribution — the marketing/behavioral pass that
    * credits each purchase to the user's FIRST `view` in the
    * preceding [[ATTR_WINDOW_D]] days: a conditional `min` over a
    * µs-exact RANGE frame (`unix_micros` ordering ≡ DuckDB
    * `epoch_us`), so the window boundary can't be misclassified by
    * second-level truncation. Purchases with no view in the window
    * are `organic` (gap −1). Output: purchases per whole-day gap —
    * the attribution-lag histogram.
    *
    * Scale: ONE user-keyed window pass (the [[qEwma]] exchange) over
    * events projected to 3 columns; the day-gap rollup has ≤ 9 groups
    * so partials collapse map-side. No self-join — the naive
    * formulation (purchases ⋈ views per user) re-shuffles the event
    * stream twice and explodes on power users; the range frame is
    * the skew-proof shape.
    */
  private val ATTR_WINDOW_D = 7L

  private def qAttribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val winUs = ATTR_WINDOW_D * 86400L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-winUs, 0L)
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("first_view_us",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      // integer `div`, not `/`: double division of µs longs can round
      // a hair under a day boundary up to the next integer
      .withColumn("gap_day",
        coalesce(expr(s"(ts_us - first_view_us) div ${86400L * 1000000L}"),
          lit(-1L)))
      .groupBy(col("gap_day"))
      .agg(count(lit(1)).as("n_purchases"))
  }

  private val qAttributionSql: String = {
    val winUs = ATTR_WINDOW_D * 86400L * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       |attr AS (
       |  SELECT user_id, event_type, ts_us,
       |    min(CASE WHEN event_type = 'view' THEN ts_us END) OVER (
       |      PARTITION BY user_id ORDER BY ts_us
       |      RANGE BETWEEN $winUs PRECEDING AND CURRENT ROW)
       |      AS first_view_us
       |  FROM e)
       |SELECT coalesce((ts_us - first_view_us) // ${86400L * 1000000L},
       |                -1) AS gap_day,
       |  CAST(count(*) AS BIGINT) AS n_purchases
       |FROM attr
       |WHERE event_type = 'purchase'
       |GROUP BY 1""".stripMargin
  }

  // ----------------------------------------------------- q_forecast_naive
  /** Seasonal-naive forecast backtest — the baseline every real
    * forecasting system must beat before it ships: predict each
    * day's volume with the value from 7 days earlier (calendar
    * JOIN on day−7, not a 7-ROW lag — missing days must not
    * misalign the season), then score the backtest per type with an
    * integer MAPE analog: `Σ|actual − forecast| · 10⁶ div Σactual`.
    * Daily sums ride the scaled-BIGINT decimal route, so error and
    * denominator are exact and the ppm score is bit-identical. Read
    * next to [[qSeasonality]] (which says WHICH weekday pattern the
    * naive forecast is exploiting).
    *
    * Scale: the corpus collapses to (type, day) first (the
    * [[qChangepoint]] discipline); the backtest is a self-join of
    * that dashboard-sized frame on (type, day−7) plus one per-type
    * aggregation.
    */
  private def qForecastNaive(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)")
        .as("x"))
    val lagged = daily.select(col("event_type"),
      col("day").as("base_day"), col("x").as("x7"))
    daily
      .join(lagged,
        daily("event_type") === lagged("event_type") &&
          date_sub(col("day"), 7) === col("base_day"))
      .drop(lagged("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_backtest"),
        sum(abs(col("x") - col("x7"))).as("abs_err_scaled"),
        sum(col("x")).as("actual_scaled"))
      .select(col("event_type"), col("n_backtest"),
        // the ×10⁴-scaled revenue totals are corpus-scale — the ·10⁶
        // numerator routes through DECIMAL(38,0) (BIGINT wraps past
        // Σ|err| ≈ 9.2·10¹²); the ppm quotient always fits a long
        expr("CAST(abs_err_scaled AS DECIMAL(38,0)) * 1000000" +
          " div actual_scaled").as("mape_ppm"))
  }

  private val qForecastNaiveSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |bt AS (
      |  SELECT a.event_type, a.x, b.x AS x7
      |  FROM daily a
      |  JOIN daily b ON b.event_type = a.event_type
      |               AND b.day = a.day - 7)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_backtest,
      |  CAST(CAST(sum(abs(x - x7)) AS HUGEINT) * 1000000 // sum(x)
      |       AS BIGINT) AS mape_ppm
      |FROM bt GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q_heavy_users
  /** Workload-skew audit — what share of total event volume the
    * top-10 / top-100 / top-1000 users generate (integer ppm): the
    * capacity-planning and cache-sizing readout ("a top-100 hot set
    * covers 4 % of traffic"), and the skew early-warning for every
    * user-keyed operator in this engine — when top-10 coverage
    * climbs, the salting/AQE paths ([[qSkewJoin]]) start paying for
    * themselves. Same cutoff-sweep shape as `q_vocab_coverage`, on
    * the workload axis.
    *
    * Scale: one user-keyed count, then per cutoff a
    * TakeOrderedAndProject over the user frame + a bounded sum —
    * never a corpus-wide rank.
    */
  private val HEAVY_CUTS = Seq(10, 100, 1000)

  private def qHeavyUsers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.IntegerType
    val per = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val tot = per.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_users"))
    HEAVY_CUTS.map { k =>
      per.orderBy(col("n").desc, col("user_id")).limit(k)
        .agg(count(lit(1)).as("k_eff"), sum(col("n")).as("top_n"))
        .crossJoin(broadcast(tot))
        .select(lit(k).cast(IntegerType).as("top_k"),
          col("k_eff").cast(IntegerType).as("k_eff"),
          col("n_users"), col("top_n"), col("total"),
          // top_n can reach 10¹¹⁺ events on skewed corpora → decimal
          expr("CAST(top_n AS DECIMAL(38,0)) * 1000000 div total")
            .as("share_ppm"))
    }.reduce(_.unionAll(_))
  }

  private val qHeavyUsersSql: String = {
    def cut(k: Int): String =
      s"""SELECT CAST($k AS INTEGER) AS top_k,
         |  CAST(count(*) AS INTEGER) AS k_eff,
         |  (SELECT CAST(count(*) AS BIGINT) FROM per) AS n_users,
         |  CAST(sum(n) AS BIGINT) AS top_n,
         |  (SELECT CAST(sum(n) AS BIGINT) FROM per) AS total,
         |  CAST(CAST(sum(n) AS HUGEINT) * 1000000 //
         |    (SELECT sum(n) FROM per) AS BIGINT) AS share_ppm
         |FROM (SELECT n FROM per ORDER BY n DESC, user_id LIMIT $k)"""
        .stripMargin
    s"""WITH per AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1)
       |${HEAVY_CUTS.map(cut).mkString("\nUNION ALL\n")}""".stripMargin
  }

  // ----------------------------------------------------------- q_freshness
  /** Data-freshness audit — per event type: newest event, staleness
    * vs the corpus watermark in whole minutes, and a stale flag at
    * 24 h: the ingestion-health dashboard every CDC mirror and
    * warehouse loader watches (a type whose feed silently stopped
    * shows up here first). Staleness is µs-exact integer arithmetic
    * (`unix_micros` ≡ `epoch_us`), divided to minutes with `div` —
    * no timestamp subtraction semantics to disagree on.
    *
    * Scale: one (type)-keyed max aggregation — map-side partials,
    * group count = type cardinality; the watermark is a 1-row
    * broadcast.
    */
  private def qFreshness(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts"))
    val wm = ev.agg(max(unix_micros(col("ts"))).as("wm_us"))
    ev.groupBy(col("event_type"))
      .agg(max(col("ts")).as("latest"),
        max(unix_micros(col("ts"))).as("latest_us"),
        count(lit(1)).as("n"))
      .crossJoin(broadcast(wm))
      .select(col("event_type"), col("latest"), col("n"),
        expr("(wm_us - latest_us) div 60000000").as("stale_minutes"),
        expr("(wm_us - latest_us) div 60000000 > 1440").as("is_stale"))
  }

  private val qFreshnessSql: String =
    """WITH wm AS (SELECT max(epoch_us(ts)) AS wm_us FROM events),
      |per AS (
      |  SELECT event_type, max(ts) AS latest,
      |    max(epoch_us(ts)) AS latest_us,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1)
      |SELECT event_type, latest, n,
      |  CAST((wm.wm_us - latest_us) // 60000000 AS BIGINT)
      |    AS stale_minutes,
      |  (wm.wm_us - latest_us) // 60000000 > 1440 AS is_stale
      |FROM per CROSS JOIN wm""".stripMargin

  // ------------------------------------------------------ q_user_outliers
  /** Personal-baseline outliers — events deviating > 2σ from the SAME
    * user's trailing window, the per-entity complement of
    * [[qAnomaly]]'s global 3σ rule (a power user's normal is another
    * user's outlier; fraud/abuse detection keys on personal
    * baselines). The test runs entirely in scaled integers: with
    * window sums `sx = Σx`, `sxx = Σx²` over the trailing
    * [[OUT_WIN]] rows (x scaled ×10², x² thus ×10⁴), the 2σ flag
    * `(x − sx/n)² > 4·(sxx/n − (sx/n)²)` clears denominators to
    * `(n·x − sx)² > 4·(n·sxx − sx²)` — DECIMAL(38,0) products, no
    * division, no float boundary. Output: flagged event count and
    * total per user (only users with ≥1 flag).
    *
    * Scale: ONE user-keyed window exchange (the [[qEwma]] shape) with
    * two running integer sums; flagging is a map-side comparison and
    * the rollup is user-keyed. Bounded frame = bounded state: the
    * same kernel runs streaming as an [[OUT_WIN]]-element buffer.
    */
  private val OUT_WIN = 8

  private def qUserOutliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(OUT_WIN - 1), 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("xs", expr("CAST(floor(value * 100) AS BIGINT)"))
      .withColumn("sx", sum(col("xs")).over(w))
      .withColumn("sxx", sum(expr("xs * xs")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("n") === OUT_WIN)
      .filter(expr(
        """CAST(n AS DECIMAL(38,0)) * xs - sx != 0 AND
          |(CAST(n AS DECIMAL(38,0)) * xs - sx)
          |  * (CAST(n AS DECIMAL(38,0)) * xs - sx)
          |  > 4 * (CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
          |""".stripMargin.replace("\n", " ")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_outliers"),
        Det.dsum(col("value")).as("outlier_value"))
  }

  private val qUserOutliersSql: String =
    s"""WITH scored AS (
       |  SELECT user_id, event_id, value,
       |    CAST(floor(value * 100) AS BIGINT) AS xs,
       |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
       |      AS sx,
       |    CAST(sum(CAST(floor(value * 100) AS BIGINT)
       |           * CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
       |      AS sxx,
       |    count(*) OVER w AS n
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN ${OUT_WIN - 1} PRECEDING AND CURRENT ROW))
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_outliers,
       |  ${graft.Det.dsumSql("value")} AS outlier_value
       |FROM scored
       |WHERE n = $OUT_WIN
       |  AND CAST(n AS HUGEINT) * xs - sx <> 0
       |  AND (CAST(n AS HUGEINT) * xs - sx) * (CAST(n AS HUGEINT) * xs - sx)
       |      > 4 * (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------ q_p95_worst_days
  /** Time-sliced tail monitoring — per (event type, day), the exact
    * interpolated p95 of `value`, surfacing each type's 3 WORST days:
    * the SLA/latency-dashboard shape ("which days breached") that
    * [[qMad]]'s corpus-level dispersion and [[qChangepoint]]'s mean
    * shift both miss — tail regressions hide under stable means.
    * `percentile` ≡ DuckDB `quantile_cont` (identical interpolation
    * on identical doubles — the established q_percentiles parity).
    *
    * Scale: one (type, day) aggregation (exact within-group
    * percentile sorts the group; at warehouse scale swap in mergeable
    * `percentile_approx` t-digests, same query shape), then a
    * per-type top-3 window over the day-count-sized frame.
    */
  private def qP95WorstDays(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.IntegerType
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("percentile(value, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("p95").desc, col("day"))))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("day"), col("n"), col("p95"),
        col("rk").cast(IntegerType).as("rk"))
  }

  private val qP95WorstDaysSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    quantile_cont(value, 0.95) AS p95,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n, p95, CAST(rk AS INTEGER) AS rk
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |                               ORDER BY p95 DESC, day) AS rk
      |  FROM daily)
      |WHERE rk <= 3""".stripMargin

  // ------------------------------------------------------- q_log2_buckets
  /** Power-of-two value histogram — the long-tail companion of
    * [[qHistogram]]'s equi-width buckets: bucket = ⌊log₂(v)⌋,
    * computed WITHOUT logs as `len(bin(⌊v⌋)) − 1` (the bit length of
    * the integer part — exact integer arithmetic, so the bucket
    * boundary can't move with a libm version), values < 1 pooled in
    * bucket 0. Doubling buckets keep resolution constant in relative
    * terms — the natural shape for latencies, sizes, and revenue-like
    * columns where equi-width buckets put 99 % of rows in bucket 1.
    *
    * Scale: map-only bucket assignment; group count ≤ 64 per type,
    * partials collapse map-side (the [[qHistogram]] discipline).
    */
  private def qLog2Buckets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.IntegerType
    Tables.events(s, d)
      .select(col("event_type"),
        expr("IF(value < 1, 0, length(bin(CAST(floor(value) AS BIGINT))) - 1)")
          .cast(IntegerType).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  private val qLog2BucketsSql: String =
    """SELECT event_type,
      |  CAST(CASE WHEN value < 1 THEN 0
      |            ELSE length(bin(CAST(floor(value) AS BIGINT))) - 1
      |       END AS INTEGER) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------ q_session_stats
  /** Session-size distribution — the corpus-level rollup of
    * `q_sessionize`'s per-session rows: how many sessions contain 1,
    * 2, … events, with share in ppm. The engagement-shape readout (a
    * mass at size 1 is bounce traffic; a heavy tail is depth) that
    * per-session rows are too granular to show, and the second output
    * the [[qGapHistogram]] threshold decision consults.
    *
    * Scale: the same single user-keyed window pass as q_sessionize
    * (lag + running gap count — no self-join), one session-keyed agg,
    * then a ≤max-session-size-group histogram with a broadcast total.
    */
  private def qSessionStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    val sized = Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          (unix_micros(col("ts")) - col("prev_us")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
    val hist = sized.groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"))
    val tot = hist.agg(sum(col("n_sessions")).as("t"))
    hist.crossJoin(broadcast(tot))
      .select(col("n_events"), col("n_sessions"),
        // the bounce bucket holds most of 10¹¹⁺ sessions → decimal
        expr("CAST(n_sessions AS DECIMAL(38,0)) * 1000000 div t")
          .as("share_ppm"))
  }

  private val qSessionStatsSql: String =
    """WITH sized AS (
      |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
      |  FROM (
      |    SELECT user_id,
      |      SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING
      |                        AND CURRENT ROW) AS session_id
      |    FROM (
      |      SELECT user_id, ts, event_id,
      |        CASE WHEN prev_us IS NULL
      |                  OR epoch_us(ts) - prev_us > 30*60*1000*1000
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM (
      |        SELECT user_id, ts, event_id,
      |          lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
      |                                     ORDER BY ts, event_id)
      |            AS prev_us
      |        FROM events)))
      |  GROUP BY 1, 2),
      |hist AS (
      |  SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions
      |  FROM sized GROUP BY 1)
      |SELECT n_events, n_sessions,
      |  CAST(CAST(n_sessions AS HUGEINT) * 1000000
      |       // (SELECT sum(n_sessions) FROM hist)
      |       AS BIGINT) AS share_ppm
      |FROM hist""".stripMargin

  // ------------------------------------------------------ q_active_users
  /** DAU / WAU / MAU + stickiness — the product-analytics vital signs:
    * per day, distinct users active that day, in the trailing 7 days,
    * and in the trailing 28, with stickiness = DAU·10⁶ div MAU (the
    * "how habitual is usage" ratio). EXACT trailing distincts via the
    * contribution expansion: the corpus collapses to DISTINCT
    * (user, day) once, then each user-day contributes itself to the
    * next 7/28 days (`explode(sequence(...))` — a ×7/×28 fanout of
    * the ALREADY-COLLAPSED user-day frame, not of raw events), and
    * one distinct count per day closes each window. Calendar-bounded
    * output; days with zero trailing-28 activity cannot appear (every
    * day present has MAU ≥ its own DAU ≥ 1).
    *
    * Scale: the user-day frame is the unit that fans out — at
    * warehouse scale the exact expansion swaps for the per-day HLL
    * sketches `q_hll` already maintains (union of 7/28 daily sketches
    * = the trailing distinct, mergeability spec-pinned); this exact
    * form is the calibration twin.
    */
  private def qActiveUsers(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
      .transform(graft.Memo.checkpoint) // feeds three expansions
    val span = ud.agg(max(col("day")).as("max_day"))
    def trailing(w: Int, out: String): DataFrame =
      ud.crossJoin(broadcast(span))
        .select(col("user_id"),
          explode(expr(s"sequence(day, least(day + ${w - 1}, max_day))"))
            .as("day"))
        .groupBy(col("day"))
        .agg(count_distinct(col("user_id")).as(out))
    val dau = ud.groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("dau"))
    dau
      .join(trailing(7, "wau"), Seq("day"))
      .join(trailing(28, "mau"), Seq("day"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("dau * 1000000 div mau").as("stickiness_ppm"))
  }

  private val qActiveUsersSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |span AS (SELECT max(day) AS max_day FROM ud),
      |w7 AS (
      |  SELECT g.day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      |  FROM (SELECT user_id,
      |          unnest(range(day, least(day + 7,
      |                                  (SELECT max_day FROM span) + 1)))
      |            AS day
      |        FROM ud) g
      |  GROUP BY 1),
      |w28 AS (
      |  SELECT g.day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      |  FROM (SELECT user_id,
      |          unnest(range(day, least(day + 28,
      |                                  (SELECT max_day FROM span) + 1)))
      |            AS day
      |        FROM ud) g
      |  GROUP BY 1),
      |d AS (
      |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      |  FROM ud GROUP BY 1)
      |SELECT d.day, dau, wau, mau,
      |  CAST(dau * 1000000 // mau AS BIGINT) AS stickiness_ppm
      |FROM d JOIN w7 ON w7.day = d.day JOIN w28 ON w28.day = d.day"""
      .stripMargin

  // --------------------------------------------------------------- q_l28
  /** L28 engagement-depth histogram — users bucketed by how many of
    * the corpus's final 28 days they were active (the Facebook L28
    * metric): depth 1 is drive-by, depth 28 is daily-habit. The
    * engagement-QUALITY readout DAU counts flatten away; its shape
    * (bimodal vs decaying) decides retention strategy.
    *
    * Scale: the same collapsed user-day frame, filtered to the
    * 28-day tail, one user-keyed count + one ≤28-group histogram.
    */
  private def qL28(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val span = ud.agg(max(col("day")).as("max_day"))
    ud.crossJoin(broadcast(span))
      .filter(col("day") > col("max_day") - 28)
      .groupBy(col("user_id")).agg(count(lit(1)).as("days_active"))
      .groupBy(col("days_active")).agg(count(lit(1)).as("n_users"))
  }

  private val qL28Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |tail28 AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS days_active
      |  FROM ud
      |  WHERE day > (SELECT max(day) FROM ud) - 28
      |  GROUP BY 1)
      |SELECT days_active, CAST(count(*) AS BIGINT) AS n_users
      |FROM tail28 GROUP BY 1""".stripMargin

  // ----------------------------------------------------- q_gap_histogram
  /** Inter-event gap distribution — the histogram that JUSTIFIES the
    * sessionization threshold instead of assuming it: per-user
    * consecutive event gaps in whole seconds, bucketed on the log₂
    * scale (bit length — no libm), counted per bucket with the
    * cumulative share in ppm. A session cut belongs at the histogram
    * knee (the bucket where the within-session mass ends and the
    * between-visit tail begins); `q_sessionize`'s 30-minute gap is a
    * claim this query audits (bucket 11 ≈ 2048 s ≈ 34 min).
    *
    * Scale: one user-partitioned lag window (per-user frames, never
    * global), then a ≤64-group aggregation; the cumulative share runs
    * over the bucket frame (≤64 rows, bounded by the 63-bit gap
    * domain — allowlist-free because the limit-free window sits on a
    * bounded-by-construction frame... pinned via the plan guard's
    * bounded-by-construction list).
    */
  private def qGapHistogram(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gaps = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("us"))))
      .filter(col("prev").isNotNull)
      .select(expr("(us - prev) div 1000000").as("gap_s"))
      .filter(col("gap_s") >= 0)
    val hist = gaps
      .select(expr("CAST(IF(gap_s < 1, 0," +
        " length(bin(gap_s)) - 1) AS INT)").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val tot = hist.agg(sum(col("n")).as("t"))
    hist
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("bucket"))))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"),
        // cum reaches the full gap count (≈ event count) → decimal
        expr("CAST(cum AS DECIMAL(38,0)) * 1000000 div t")
          .as("cum_share_ppm"))
  }

  private val qGapHistogramSql: String =
    """WITH gaps AS (
      |  SELECT (us - prev) // 1000000 AS gap_s FROM (
      |    SELECT epoch_us(ts) AS us,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |                              ORDER BY epoch_us(ts)) AS prev
      |    FROM events)
      |  WHERE prev IS NOT NULL AND (us - prev) // 1000000 >= 0),
      |hist AS (
      |  SELECT CAST(CASE WHEN gap_s < 1 THEN 0
      |              ELSE length(bin(gap_s)) - 1 END AS INTEGER)
      |    AS bucket, CAST(count(*) AS BIGINT) AS n
      |  FROM gaps GROUP BY 1)
      |SELECT bucket, n,
      |  CAST(CAST(sum(n) OVER (ORDER BY bucket) AS HUGEINT) * 1000000
      |       // (SELECT sum(n) FROM hist) AS BIGINT) AS cum_share_ppm
      |FROM hist""".stripMargin

  // ------------------------------------------------------- q_decile_lift
  /** Decile gains table — the model-evaluation / campaign-targeting
    * readout: rank users by a score (here activity = event count, the
    * stand-in for any model score), cut into deciles, and report each
    * decile's conversion rate plus CUMULATIVE lift over the base rate
    * in ppm — "the top 10 % of scored users convert at 2.3× base" is
    * the sentence this table exists to produce. Conversion shares the
    * [[qAbTest]] outcome (≥1 high-value purchase).
    *
    * Determinism: decile = `ntile(10)` semantics over
    * (score DESC, user_id) — the id tie-break pins the cut; lift is
    * integer ppm over exact counts routed through DECIMAL(38,0)/
    * HUGEINT (the [[qChi2]] discipline — BIGINT wraps silently past
    * ~3M users while the oracle keeps going).
    *
    * Scale: NO global sort. The score histogram is value-domain-sized
    * (distinct activity counts ≪ users), so the "users with a
    * strictly higher score" prefix comes from a broadcast non-equi
    * self-join over it, and each user's global rank is that prefix
    * plus its row_number WITHIN its score group (score-partitioned
    * window — one shuffle of the user frame by score, never a
    * single-partition sort). The decile then falls out of the rank by
    * pure arithmetic — with q = n div 10 and r = n mod 10, tiles 1..r
    * hold q+1 rows and the rest hold q — bit-identical to ntile(10)
    * because the composite ordering key is unique. Running sums over
    * the 10 decile rows use a broadcast ≤-self-join, keeping the whole
    * plan free of partition-less WindowExec.
    */
  private def qDecileLift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("score"),
        max(when(col("event_type") === "purchase" && col("value") > 150,
          1L).otherwise(0L)).as("converted"))
    val hist = users.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
    val higher = hist.alias("a")
      .join(broadcast(hist.alias("b")), col("b.score") > col("a.score"),
        "left")
      .groupBy(col("a.score").as("score"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("n_higher"))
    val totals = users.agg(
      count(lit(1)).as("tot_users"), sum(col("converted")).as("tot_conv"))
    val cut = users
      .join(broadcast(higher), Seq("score"))
      .withColumn("rnk", col("n_higher") + row_number().over(
        Window.partitionBy(col("score")).orderBy(col("user_id"))))
      .crossJoin(broadcast(totals))
      .withColumn("decile", expr(
        """CAST(IF(rnk <= (tot_users % 10) * (tot_users div 10 + 1),
          |  (rnk + tot_users div 10) div (tot_users div 10 + 1),
          |  tot_users % 10
          |    + (rnk - (tot_users % 10) * (tot_users div 10 + 1)
          |       + tot_users div 10 - 1) div (tot_users div 10))
          |AS INT)""".stripMargin.replace("\n", " ")))
    val byDecile = cut.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    byDecile.alias("d")
      .join(broadcast(byDecile.alias("e")),
        col("e.decile") <= col("d.decile"))
      .groupBy(col("d.decile").as("decile"),
        col("d.n_users").as("n_users"), col("d.n_conv").as("n_conv"))
      .agg(sum(col("e.n_users")).as("cum_users"),
        sum(col("e.n_conv")).as("cum_conv"))
      .crossJoin(broadcast(totals))
      .select(col("decile"), col("n_users"), col("n_conv"),
        expr("n_conv * 1000000 div n_users").as("rate_ppm"),
        expr("CAST(coalesce((CAST(cum_conv AS DECIMAL(38,0)) * tot_users" +
          " * 1000000) div nullif(CAST(cum_users AS DECIMAL(38,0))" +
          " * tot_conv, 0), 0) AS BIGINT)").as("cum_lift_ppm"))
  }

  private val qDecileLiftSql: String =
    """WITH users AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS score,
      |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 150
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS converted
      |  FROM events GROUP BY 1),
      |cut AS (
      |  SELECT user_id, converted,
      |    ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
      |  FROM users),
      |d AS (
      |  SELECT CAST(decile AS INTEGER) AS decile,
      |    CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(converted) AS BIGINT) AS n_conv
      |  FROM cut GROUP BY 1),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS tot_users,
      |    CAST(sum(converted) AS BIGINT) AS tot_conv FROM users)
      |SELECT decile, n_users, n_conv,
      |  CAST(n_conv * 1000000 // n_users AS BIGINT) AS rate_ppm,
      |  CAST(coalesce((CAST(cum_conv AS HUGEINT) * tot_users * 1000000)
      |    // nullif(CAST(cum_users AS HUGEINT) * tot_conv, 0), 0)
      |    AS BIGINT) AS cum_lift_ppm
      |FROM (
      |  SELECT d.*, t.tot_users, t.tot_conv,
      |    CAST(sum(n_users) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_users,
      |    CAST(sum(n_conv) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_conv
      |  FROM d CROSS JOIN t)""".stripMargin

  // -------------------------------------------------------- q_seasonality
  /** Day-of-week seasonality profile per event type — the periodic
    * decomposition a capacity planner or anomaly baseline reads
    * before interpreting any daily number: per (type, weekday) cell
    * — `dow` uses Spark's `dayofweek` numbering, Sunday=1..Saturday=7,
    * NOT ISO-8601 Monday=1 (join an ISO weekday dimension via
    * `weekday(ts)+1` instead) — event count, integer-ppm share of the
    * type's total, and a peak flag (is this the type's busiest
    * weekday — ties to the earliest weekday, in that same
    * numbering). The [[qChangepoint]] level-shift and this
    * periodic profile are the two decompositions that turn a raw
    * daily series into something monitorable.
    *
    * Scale: ONE hash aggregation to (type × 7) cells — partials
    * collapse map-side on any event volume; totals and peaks derive
    * from the cell frame via a ≤7-row window per type.
    */
  private def qSeasonality(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.IntegerType
    val cells = Tables.events(s, d)
      .groupBy(col("event_type"),
        dayofweek(col("ts")).cast(IntegerType).as("dow"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type"))
    cells
      .withColumn("total", sum(col("n")).over(byType))
      .withColumn("rk", row_number().over(
        byType.orderBy(col("n").desc, col("dow"))))
      .select(col("event_type"), col("dow"), col("n"),
        // per-(type,dow) counts are corpus-scale → decimal
        expr("CAST(n AS DECIMAL(38,0)) * 1000000 div total")
          .as("share_ppm"),
        (col("rk") === 1).as("is_peak"))
  }

  private val qSeasonalitySql: String =
    """WITH cells AS (
      |  SELECT event_type,
      |    CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, dow, n,
      |  CAST(CAST(n AS HUGEINT) * 1000000 // total AS BIGINT)
      |    AS share_ppm,
      |  rk = 1 AS is_peak
      |FROM (
      |  SELECT *,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY n DESC, dow) AS rk
      |  FROM cells)""".stripMargin

  // ------------------------------------------------------------ q_ab_test
  /** A/B experiment readout — the two-proportion χ² significance test
    * over a deterministic unit assignment (variant = `user_id % 2`,
    * the stand-in for the hash-of-unit bucketing every experiment
    * platform uses; the unit is the USER, not the event — assignment
    * and outcome both collapse per user first, the
    * unit-of-randomization discipline that keeps the test valid).
    * Outcome: converted = had ≥1 HIGH-VALUE purchase (value > 150 —
    * ~45 % of users at every SF, so both table margins are
    * non-degenerate). χ² for the 2×2 table in
    * the [[qChi2]]-style integer form `n·(ad−bc)²·10⁶ /
    * (margin products)`, routed through DECIMAL(38,0)/HUGEINT with a
    * SPLIT division: the naive single product n·(ad−bc)²·10⁶ crosses
    * 38 digits at n ≈ 2.7 M subjects — a silent chi2=0 on any
    * real-sized experiment — so the quotient is computed as
    * `q·n + (r·n) div den` with `q = (ad−bc)²·10⁶ div den`,
    * `r` its remainder (exact: q·n is integral, so the floor
    * distributes), which is exact to n ≈ 4.5·10⁷ subjects in both
    * engines (the r·n term is the 38-digit governor; beyond that,
    * divide all cells by a common factor first — the decision
    * threshold is scale-free). `significant` compares against
    * χ²₍0.05,1₎ = 3.841459 ×10⁶ as an integer — no float boundary to
    * disagree on.
    *
    * Scale: one user-keyed aggregation (conversion flag) + one
    * 4-cell global aggregation; partials collapse map-side, the
    * final row is a scalar frame.
    */
  private def qAbTest(s: SparkSession, d: String): DataFrame = {
    val conv = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 150,
        1L).otherwise(0L)).as("converted"))
      .withColumn("variant", (col("user_id") % 2).cast("int"))
    abTestFromCells(conv.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L))
        .as("conv_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L))
        .as("conv_b")))
  }

  /** The χ² arithmetic over a 1-row (n_a, conv_a, n_b, conv_b) cell
    * frame — split out so the old-overflow regime (n past ~2.7 M
    * subjects, unreachable by materializing users in a test) is
    * unit-testable with synthetic cells.
    */
  private[ops] def abTestFromCells(cells: DataFrame): DataFrame = {
    cells
      .withColumn("dd", expr(
        """CAST(conv_a AS DECIMAL(38,0)) * (n_b - conv_b)
          |  - CAST(n_a - conv_a AS DECIMAL(38,0)) * conv_b"""
          .stripMargin.replace("\n", " ")))
      .withColumn("den", expr(
        """nullif(CAST(n_a AS DECIMAL(38,0)) * n_b
          |  * (conv_a + conv_b)
          |  * ((n_a - conv_a) + (n_b - conv_b)), 0)"""
          .stripMargin.replace("\n", " ")))
      .withColumn("aa", expr("dd * dd * 1000000"))
      .select(col("n_a"), col("conv_a"),
        expr("conv_a * 1000000 div n_a").as("rate_a_ppm"),
        col("n_b"), col("conv_b"),
        expr("conv_b * 1000000 div n_b").as("rate_b_ppm"),
        // Split division (scaladoc): floor(n·aa/den) = q·n + (r·n) div
        // den with q integral — never materializes the 5-factor product.
        expr(
          """CAST(coalesce(
            |  (aa div den) * (n_a + n_b)
            |  + (pmod(aa, den) * (n_a + n_b)) div den,
            |  0) AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("chi2_ppm"))
      .withColumn("significant", col("chi2_ppm") > 3841459L)
  }

  private val qAbTestSql: String =
    """WITH conv AS (
      |  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
      |    max(CASE WHEN event_type = 'purchase' AND value > 150
      |             THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY 1),
      |cells AS (
      |  SELECT
      |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_a,
      |    CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END)
      |      AS BIGINT) AS conv_a,
      |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_b,
      |    CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END)
      |      AS BIGINT) AS conv_b
      |  FROM conv),
      |terms AS (
      |  SELECT *,
      |    (CAST(conv_a AS HUGEINT) * (n_b - conv_b)
      |     - CAST(n_a - conv_a AS HUGEINT) * conv_b) AS dd,
      |    nullif(CAST(n_a AS HUGEINT) * n_b
      |      * (conv_a + conv_b)
      |      * ((n_a - conv_a) + (n_b - conv_b)), 0) AS den
      |  FROM cells),
      |chi AS (
      |  SELECT *,
      |    CAST(coalesce(
      |      (dd * dd * 1000000 // den) * (n_a + n_b)
      |      + ((dd * dd * 1000000 % den) * (n_a + n_b)) // den,
      |      0) AS BIGINT) AS chi2_ppm
      |  FROM terms)
      |SELECT n_a, conv_a,
      |  CAST(conv_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
      |  n_b, conv_b,
      |  CAST(conv_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
      |  chi2_ppm,
      |  chi2_ppm > 3841459 AS significant
      |FROM chi""".stripMargin

  // ------------------------------------------------------------- q_paths
  /** Session path mining — the multi-step extension of
    * [[qTransitions]]'s 1-step matrix: the first 3 event types of
    * every 30-min-gap session (the [[graft.ops.RelationalQueries]]
    * q_sessionize session rule), concatenated into a path string,
    * ranked by frequency — "how do sessions OPEN" is the entry-page /
    * onboarding analysis behind funnel design. Top-20 paths.
    *
    * Determinism: the prefix is ordered by (ts, event_id) — the
    * per-list sort rides an `array_sort(collect_list(struct))`
    * (Spark) ≡ `string_agg(... ORDER BY rn)` (DuckDB), never an
    * unordered collect. Scale: both window passes share the user
    * exchange (a (user, session) partition is a refinement of the
    * user partition); per-session state is capped at 3 rows before
    * the path agg, and the path histogram's tail is cut by a
    * TakeOrderedAndProject top-20, never a global sort.
    */
  private def qPaths(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.IntegerType
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    val prefix = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          (unix_micros(col("ts")) - col("prev_us")) > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("session_id"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= 3)
    prefix
      .groupBy(col("user_id"), col("session_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(rn, event_type)))," +
          " x -> x.event_type), '>')").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_sessions").desc, col("path"))).cast(IntegerType))
  }

  private val qPathsSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN prev_us IS NULL
      |              OR epoch_us(ts) - prev_us > 30*60*1000*1000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM (
      |    SELECT user_id, event_id, ts, event_type,
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |                              ORDER BY ts, event_id) AS prev_us
      |    FROM events)),
      |sess AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked),
      |pref AS (
      |  SELECT * FROM (
      |    SELECT user_id, session_id, event_type,
      |      row_number() OVER (PARTITION BY user_id, session_id
      |                         ORDER BY ts, event_id) AS rn
      |    FROM sess)
      |  WHERE rn <= 3),
      |paths AS (
      |  SELECT user_id, session_id,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM pref GROUP BY 1, 2),
      |hist AS (
      |  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      |  FROM paths GROUP BY 1)
      |SELECT path, n_sessions, CAST(rnk AS INTEGER) AS rnk FROM (
      |  SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rnk
      |  FROM hist)
      |WHERE rnk <= 20""".stripMargin

  // ----------------------------------------------------------- q_streaks
  /** Gaps-and-islands — consecutive-day activity runs per user (the
    * engagement-streak metric, and THE canonical interval-grouping
    * pattern): a user's island is a maximal run of consecutive active
    * days, found by the anchor trick `day − row_number()·1d` —
    * constant within a consecutive run, shifted by every gap — so one
    * GROUP BY on (user, anchor) materializes every island with no
    * self-join and no iterative expansion. Output: streak-length
    * histogram (n_islands + distinct users per length).
    *
    * Scale: the corpus collapses to DISTINCT (user, day) first (the
    * [[qCohort]] discipline — dedup before, never count-distinct
    * after); then ONE user-keyed window pass and two bounded
    * aggregations. The histogram's group count is ≤ max streak
    * length, so partials collapse map-side.
    */
  private def qStreaks(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.IntegerType
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val anchored = days.withColumn("anchor",
      date_sub(col("day"), row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("day")))))
    anchored.groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("len").cast(IntegerType).as("streak_len"))
      .agg(count(lit(1)).as("n_islands"),
        count_distinct(col("user_id")).as("n_users"))
  }

  private val qStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |anchored AS (
      |  SELECT user_id, day,
      |    day - CAST(row_number() OVER (
      |      PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
      |  FROM days),
      |islands AS (
      |  SELECT user_id, anchor, count(*) AS len
      |  FROM anchored GROUP BY 1, 2)
      |SELECT CAST(len AS INTEGER) AS streak_len,
      |  CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM islands GROUP BY 1""".stripMargin

  // ------------------------------------------------------- q_changepoint
  /** CUSUM changepoint detection per event type — the level-shift
    * locator behind deploy-regression hunts and pipeline-drift
    * triage: for the daily value series x_1..x_T, the classic
    * single-changepoint estimate is `argmax_t |Σ_{i≤t}(x_i − x̄)|`.
    * Division-free integer form: `S_t = T·prefix_t − t·total`
    * (= T·CUSUM_t), every term exact — daily sums ride the
    * DECIMAL(18,4)→×10⁴ scaled-BIGINT route (the [[qAnomaly]]
    * discipline) and the two products run in DECIMAL(38,0) (the
    * q_chi2 discipline: BIGINT·BIGINT would wrap silently past the
    * bench envelope while DuckDB's HUGEINT kept going). Output per
    * type: the argmax day (ties → earliest), its index, series
    * length, shift direction, and |S| scaled back to value units.
    * `direction` reads as "which way the level steps AFTER cp_day":
    * S ≥ 0 means the pre-changepoint segment sits ABOVE the overall
    * mean, i.e. the series steps 'down' at the changepoint (and
    * vice versa).
    *
    * Scale: the corpus collapses to (type, day) rows in ONE hash
    * aggregation before any window touches it — the window input is
    * dashboard-sized (types × days), so the per-type ordered pass is
    * trivially cheap no matter the event volume; t = T is excluded
    * (S_T ≡ 0). The multi-changepoint extension (binary segmentation)
    * recurses this same query on the two halves.
    */
  private def qChangepoint(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.IntegerType
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)")
        .as("x"))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val whole = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("t", row_number().over(ordered).cast("long"))
      .withColumn("prefix", sum(col("x")).over(ordered))
      .withColumn("total", sum(col("x")).over(whole))
      .withColumn("n_days", count(lit(1)).over(whole))
      .withColumn("s", expr(
        "CAST(n_days AS DECIMAL(38,0)) * prefix" +
          " - CAST(t AS DECIMAL(38,0)) * total"))
      .filter(col("t") < col("n_days"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(abs(col("s")).desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("t").cast(IntegerType).as("cp_idx"),
        col("n_days").cast(IntegerType).as("n_days"),
        when(col("s") >= 0, lit("down")).otherwise(lit("up"))
          .as("direction"),
        expr("CAST(abs(s) div 10000 AS BIGINT)").as("dev"))
  }

  private val qChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, day, t, n_days,
      |    CAST(n_days AS HUGEINT) * prefix - CAST(t AS HUGEINT) * total AS s
      |  FROM (
      |    SELECT event_type, day,
      |      row_number() OVER w AS t,
      |      CAST(sum(x) OVER w AS BIGINT) AS prefix,
      |      CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |      count(*) OVER (PARTITION BY event_type) AS n_days
      |    FROM daily
      |    WINDOW w AS (PARTITION BY event_type ORDER BY day))
      |  WHERE t < n_days),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY event_type ORDER BY abs(s) DESC, day) AS rk
      |  FROM scored)
      |SELECT event_type, day AS cp_day,
      |  CAST(t AS INTEGER) AS cp_idx,
      |  CAST(n_days AS INTEGER) AS n_days,
      |  CASE WHEN s >= 0 THEN 'down' ELSE 'up' END AS direction,
      |  CAST(abs(s) // 10000 AS BIGINT) AS dev
      |FROM ranked WHERE rk = 1""".stripMargin

  // ------------------------------------------------------------- q_drift
  /** Distribution-drift audit — the monitoring pass that decides when
    * a model needs retraining or a pipeline input changed shape: the
    * per-type value histogram ([[qHistogram]]'s buckets) is compared
    * between an early and a late period with the 2×K chi-square
    * statistic, `Σ_i (a_i·B − b_i·A)² / (A·B·(a_i+b_i))` — the
    * log-free alternative to PSI (same decision ordering, no floats).
    * Each bucket term is floored at ·10⁶ in DECIMAL(38,0) (a·B
    * squares past int64 at warehouse counts) and the per-type sum of
    * floors is integer — bit-identical cross-engine.
    *
    * Scale: map-only (period, bucket) assignment, one hash agg keyed
    * (type, bucket, period) with group count fixed at types×20×2 —
    * partials collapse map-side; the per-type totals are
    * metadata-sized and '''broadcast''' into the scoring. Nothing
    * scales with row count but the scan.
    */
  private val DRIFT_SPLIT = "2024-01-16"

  private def qDrift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        least(greatest(floor(col("value") / BUCKET_W), lit(0L)),
          lit(N_BUCKETS - 1L)).cast("long").as("bucket"),
        when(col("ts") < lit(DRIFT_SPLIT).cast("timestamp"), 1L)
          .otherwise(0L).as("in_a"))
    val cells = ev.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("in_a")).as("a"),
        sum(lit(1L) - col("in_a")).as("b"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"))
    cells.join(broadcast(totals), Seq("event_type"))
      .withColumn("term", expr(
        """CAST((CAST(a AS DECIMAL(38,0)) * n_b - CAST(b AS DECIMAL(38,0)) * n_a) *
          |     (CAST(a AS DECIMAL(38,0)) * n_b - CAST(b AS DECIMAL(38,0)) * n_a) *
          |     1000000 AS DECIMAL(38,0))""".stripMargin))
      .withColumn("den", expr(
        "CAST(n_a AS DECIMAL(38,0)) * n_b * (a + b)"))
      .withColumn("t_ppm", expr("CAST((term - term % den) / den AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("t_ppm")).as("drift_ppm"))
  }

  private val qDriftSql: String =
    s"""WITH ev AS (
       |  SELECT event_type,
       |    CAST(least(greatest(floor(value / $BUCKET_W), 0),
       |               ${N_BUCKETS - 1}) AS BIGINT) AS bucket,
       |    CASE WHEN ts < TIMESTAMP '$DRIFT_SPLIT' THEN 1 ELSE 0 END
       |      AS in_a
       |  FROM events),
       |cells AS (
       |  SELECT event_type, bucket,
       |    CAST(sum(in_a) AS BIGINT) AS a,
       |    CAST(sum(1 - in_a) AS BIGINT) AS b
       |  FROM ev GROUP BY 1, 2),
       |t AS (
       |  SELECT event_type, CAST(sum(a) AS BIGINT) AS n_a,
       |    CAST(sum(b) AS BIGINT) AS n_b
       |  FROM cells GROUP BY 1),
       |terms AS (
       |  SELECT c.event_type, t.n_a, t.n_b,
       |    CAST((CAST(c.a AS HUGEINT) * t.n_b - CAST(c.b AS HUGEINT) * t.n_a)
       |       * (CAST(c.a AS HUGEINT) * t.n_b - CAST(c.b AS HUGEINT) * t.n_a)
       |       * 1000000
       |      // (CAST(t.n_a AS HUGEINT) * t.n_b * (c.a + c.b))
       |      AS BIGINT) AS t_ppm
       |  FROM cells c JOIN t ON t.event_type = c.event_type)
       |SELECT event_type, max(n_a) AS n_a, max(n_b) AS n_b,
       |  CAST(sum(t_ppm) AS BIGINT) AS drift_ppm
       |FROM terms GROUP BY 1""".stripMargin

  // ----------------------------------------------------- q_source_overlap
  /** Audience overlap between event types — the segment-intersection
    * profile behind dataset mixing and behavioral cohorting: for each
    * type pair, how many users do both, and the user-set Jaccard.
    * All counts exact integers; jaccard_ppm = ⌊c·10⁶/(n_a+n_b−c)⌋.
    *
    * Scale: the corpus collapses FIRST to distinct (user, type) —
    * cardinality users×types, not events — and the pair counts come
    * from a self-join of that reduced frame on `user_id` (each user
    * contributes ≤ types² pairs). Per-type user counts are
    * metadata-sized → '''broadcast''' into the scoring join. The
    * event scan is the only data-sized pass.
    */
  private def qSourceOverlap(s: SparkSession, d: String): DataFrame = {
    val ut = Tables.events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
    val n = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = ut.alias("x")
      .join(ut.alias("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("c_both"))
    pairs
      .join(broadcast(n.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n", "n_a")), Seq("type_a"))
      .join(broadcast(n.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n", "n_b")), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("c_both"),
        expr("c_both * 1000000 div (n_a + n_b - c_both)")
          .as("jaccard_ppm"))
  }

  private val qSourceOverlapSql: String =
    """WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events),
      |n AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM ut GROUP BY 1),
      |pairs AS (
      |  SELECT x.event_type AS type_a, y.event_type AS type_b,
      |    CAST(count(*) AS BIGINT) AS c_both
      |  FROM ut x JOIN ut y
      |    ON x.user_id = y.user_id AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, na.n AS n_a, nb.n AS n_b, p.c_both,
      |  p.c_both * 1000000 // (na.n + nb.n - p.c_both) AS jaccard_ppm
      |FROM pairs p
      |JOIN n na ON na.event_type = p.type_a
      |JOIN n nb ON nb.event_type = p.type_b""".stripMargin

  // ------------------------------------------------------- q_transitions
  /** Markov transition matrix over user event sequences — the
    * sequence-mining pass behind next-event prediction, funnel
    * discovery (which q_funnel then measures for a FIXED path), and
    * bot detection (improbable transition chains): consecutive
    * event-type pairs per user, restricted to gaps ≤
    * [[TRANS_GAP_S]] s (the session boundary), counted and scored
    * with integer-exact ⌊c·10⁶/total⌋ share.
    *
    * Scale: one lag window pass (ONE `user_id` exchange — the
    * [[qEwma]] shape), then a 25-group aggregation whose partials
    * collapse map-side; the total is a scalar '''broadcast''' into
    * the share computation. Nothing here grows with more users.
    */
  private val TRANS_GAP_S = 1800L

  private def qTransitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      // µs-exact gap (unix_micros ≡ DuckDB epoch_us): second-level
      // truncation would misclassify boundary gaps differently per
      // engine
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .filter(col("prev_type").isNotNull &&
        col("gap_us") <= TRANS_GAP_S * 1000000L)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val total = pairs.agg(sum(col("c")).as("total"))
    pairs.crossJoin(broadcast(total))
      .select(col("prev_type"), col("event_type"), col("c"),
        // transition counts approach the event count → decimal
        expr("CAST(c AS DECIMAL(38,0)) * 1000000 div total")
          .as("share_ppm"))
  }

  private val qTransitionsSql: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type, ts,
       |    lag(event_type, 1) OVER w AS prev_type,
       |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |pairs AS (
       |  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS c
       |  FROM seq
       |  WHERE prev_type IS NOT NULL
       |    AND gap_us <= ${TRANS_GAP_S * 1000000L}
       |  GROUP BY 1, 2),
       |t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM pairs)
       |SELECT prev_type, event_type, c,
       |  CAST(CAST(c AS HUGEINT) * 1000000 // t.total AS BIGINT)
       |    AS share_ppm
       |FROM pairs, t""".stripMargin

  // ------------------------------------------------------ q_rolling_median
  /** Per-user rolling exact median over the last 5 values — the robust
    * time-series smoother ([[qEwma]]'s outlier-immune sibling: one
    * spike moves a decayed mean, it cannot move a median). Exact
    * interpolated `percentile` over a ROWS frame ≡ DuckDB
    * `quantile_cont` as a window aggregate — on a ≤5-element frame the
    * interpolation is a single IEEE midpoint, bit-identical
    * cross-engine (the q_mad discipline, windowed).
    *
    * Scale: one window pass, ONE exchange on `user_id`; the frame is
    * O(1) per row, so the pass is linear after the shuffle — the same
    * plan shape as [[qEwma]] and safely streamable as a keyed
    * 5-element buffer.
    */
  private def qRollingMedian(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("med5", expr("percentile(value, 0.5)").over(w))
  }

  private val qRollingMedianSql: String =
    """SELECT user_id, event_id, ts, value,
      |  quantile_cont(value, 0.5) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
      |FROM events""".stripMargin

  // ---------------------------------------------------------- q_winsorize
  /** Winsorized (percentile-clamped) robust mean per event type — the
    * outlier-capping preprocessing step run before any mean-based
    * model feature: values below the exact interpolated p05 are raised
    * to it, above p95 lowered to it, and the mean recomputed. The
    * clamped mean decomposes as
    * `(Σ_{p05≤v≤p95} v + n_lo·p05 + n_hi·p95) / n` — the interior sum
    * runs through [[graft.Det.dsum]] (order-independent exact
    * decimal), the two boundary products and the final three-term sum
    * are single IEEE ops in a fixed order, so the result is
    * bit-identical cross-engine AND partition-independent.
    *
    * Percentiles are interpolated EXPLICITLY from the two order
    * statistics at floor/ceil of q·(n−1), with the arithmetic
    * `a + g·(b−a)` written identically in both engines — NOT via the
    * engines' quantile builtins: for q where neither g nor 1−g is a
    * power of two (0.05/0.95 here), Spark's `percentile` and DuckDB's
    * `quantile_cont` use differently-associated coefficient forms
    * that diverge by 1 ulp even between equal neighbors, which at sf1
    * moved a plateau boundary and shifted the clip counts (caught by
    * the sf1 oracle run; q ∈ {0.25, 0.5, 0.75} — q_mad,
    * q_percentiles — are exact in any form, so the builtins stay
    * there). `a + g·(b−a)` is also exact whenever a = b.
    *
    * Scale: two passes over events (one event_type-partitioned sort
    * for the rank frame, then one agg with the broadcast thresholds)
    * — same shape as [[qMad]]; at warehouse scale the percentile pass
    * switches to mergeable `percentile_approx` t-digests, one pass,
    * same query shape.
    */
  private def qWinsorize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val byType = Window.partitionBy(col("event_type"))
    // NULL values must not enter the rank frame: the builtins this
    // rewrite replaced ignore NULLs, and Spark ranks NULLS FIRST while
    // DuckDB ranks NULLS LAST — an unfiltered NULL would shift rn
    // differently per engine and diverge the thresholds.
    val wr = ev.filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(byType.orderBy(col("value"))) - 1)
      .withColumn("n", count(lit(1)).over(byType))
    def pos(q: Double): Column = lit(q) * (col("n") - 1)
    def at(idx: Column): Column =
      max(when(col("rn") === idx.cast("long"), col("value")))
    def interp(q: Double, a: String, b: String): Column =
      col(a) + (lit(q) * (col("n_") - 1) -
        floor(lit(q) * (col("n_") - 1))) * (col(b) - col(a))
    val pct = wr.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_"),
        at(floor(pos(0.05))).as("a05"), at(ceil(pos(0.05))).as("b05"),
        at(floor(pos(0.95))).as("a95"), at(ceil(pos(0.95))).as("b95"))
      .select(col("event_type"),
        interp(0.05, "a05", "b05").as("p05"),
        interp(0.95, "a95", "b95").as("p95"))
    ev.join(broadcast(pct), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        count(lit(1)).as("n"),
        sum(when(col("value") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("value") > col("p95"), 1L).otherwise(0L)).as("n_hi"),
        graft.Det.dsum(when(col("value") >= col("p05") &&
          col("value") <= col("p95"), col("value"))).as("s_mid"))
      .withColumn("win_mean",
        (col("s_mid") + col("n_lo") * col("p05") + col("n_hi") * col("p95"))
          / col("n"))
      .select(col("event_type"), col("p05"), col("p95"), col("n"),
        col("n_lo"), col("n_hi"), col("win_mean"))
  }

  private val qWinsorizeSql: String =
    s"""WITH wr AS (
       |  SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type ORDER BY value) - 1
       |      AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events WHERE value IS NOT NULL),
       |th AS (
       |  SELECT event_type, max(n) AS n_,
       |    max(CASE WHEN rn = floor(CAST(0.05 AS DOUBLE) * (n - 1))
       |             THEN value END) AS a05,
       |    max(CASE WHEN rn = ceil(CAST(0.05 AS DOUBLE) * (n - 1))
       |             THEN value END) AS b05,
       |    max(CASE WHEN rn = floor(CAST(0.95 AS DOUBLE) * (n - 1))
       |             THEN value END) AS a95,
       |    max(CASE WHEN rn = ceil(CAST(0.95 AS DOUBLE) * (n - 1))
       |             THEN value END) AS b95
       |  FROM wr GROUP BY 1),
       |pct AS (
       |  SELECT event_type,
       |    a05 + (CAST(0.05 AS DOUBLE) * (n_ - 1)
       |           - floor(CAST(0.05 AS DOUBLE) * (n_ - 1))) * (b05 - a05)
       |      AS p05,
       |    a95 + (CAST(0.95 AS DOUBLE) * (n_ - 1)
       |           - floor(CAST(0.95 AS DOUBLE) * (n_ - 1))) * (b95 - a95)
       |      AS p95
       |  FROM th),
       |a AS (
       |  SELECT e.event_type, max(p.p05) AS p05, max(p.p95) AS p95,
       |    count(*) AS n,
       |    CAST(sum(CASE WHEN e.value < p.p05 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_lo,
       |    CAST(sum(CASE WHEN e.value > p.p95 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hi,
       |    ${graft.Det.dsumSql(
             "CASE WHEN e.value >= p.p05 AND e.value <= p.p95 " +
               "THEN e.value END")} AS s_mid
       |  FROM events e JOIN pct p ON p.event_type = e.event_type
       |  GROUP BY 1)
       |SELECT event_type, p05, p95, n, n_lo, n_hi,
       |  (s_mid + n_lo * p05 + n_hi * p95) / n AS win_mean
       |FROM a""".stripMargin

  // -------------------------------------------------------- q_constraints
  /** Declarative data-quality constraint audit (the Deequ/
    * expectations-suite shape): referential integrity, compound-key
    * uniqueness, temporal ordering, and value-range checks over the
    * order pipeline, one tall row per check with violation counts and
    * ppm rate. This is the pre-ingest gate a warehouse runs before
    * trusting a drop — and on this synthetic data it is NON-degenerate
    * (the generator emits duplicate (orderkey, linenumber) pairs and
    * ship-before-order rows), so the audit proves it actually fires.
    *
    * Scale shapes, per check: RI = LEFT ANTI joins shuffling on the
    * key (AQE free to broadcast the dimension side); uniqueness = one
    * groupBy on the compound key with map-side partial combine,
    * violations = Σ(c−1) so re-running after a dedup pass reports 0;
    * temporal = one key-partitioned join; ranges = map-only
    * single-pass aggregates. Each check is one linear shuffle or less;
    * the union glues six 1-row frames.
    */
  private def qConstraints(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    // denominators as broadcast 1-row frames — the plan stays fully
    // lazy (no driver-side action inside a query builder)
    val nLi = li.agg(count(lit(1)).as("n_checked"))
    val nOrd = ord.agg(count(lit(1)).as("n_checked"))
    def row(name: String, checked: DataFrame, viol: DataFrame): DataFrame =
      viol.crossJoin(broadcast(checked))
        .select(lit(name).as("check"),
          coalesce(col("v"), lit(0L)).as("n_violations"),
          col("n_checked"))
    val riLi = row("ri_lineitem_orders", nLi,
      li.select(col("l_orderkey"))
        .join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v")))
    val riOrd = row("ri_orders_customer", nOrd,
      ord.select(col("o_custkey"))
        .join(cust.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v")))
    val pk = row("unique_lineitem_pk", nLi,
      li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(sum(col("c") - 1).as("v")))
    val temporal = row("ship_not_before_order", nLi,
      li.select(col("l_orderkey"), col("l_shipdate"))
        .join(ord.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") < col("o_orderdate"))
        .agg(count(lit(1)).as("v")))
    val qty = row("range_quantity_1_50", nLi,
      li.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
        .agg(count(lit(1)).as("v")))
    val price = row("positive_extendedprice", nLi,
      li.filter(col("l_extendedprice") <= 0)
        .agg(count(lit(1)).as("v")))
    riLi.union(riOrd).union(pk).union(temporal).union(qty).union(price)
      .withColumn("viol_ppm",
        // n_violations is row-scale (10¹³ lineitems at 100 TB);
        // n_checked = 0 (empty drop) → rate 0, not divide-by-zero
        expr("IF(n_checked = 0, 0L," +
          " CAST(n_violations AS DECIMAL(38,0)) * 1000000" +
          " div n_checked)"))
  }

  private val qConstraintsSql: String =
    """WITH n AS (SELECT count(*) AS n_li FROM lineitem),
      |no AS (SELECT count(*) AS n_ord FROM orders),
      |checks AS (
      |  SELECT 'ri_lineitem_orders' AS "check",
      |    (SELECT count(*) FROM lineitem l
      |     ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |      AS n_violations,
      |    (SELECT n_li FROM n) AS n_checked
      |  UNION ALL
      |  SELECT 'ri_orders_customer',
      |    (SELECT count(*) FROM orders o
      |     ANTI JOIN customer c ON o.o_custkey = c.c_custkey),
      |    (SELECT n_ord FROM no)
      |  UNION ALL
      |  SELECT 'unique_lineitem_pk',
      |    (SELECT COALESCE(CAST(sum(c - 1) AS BIGINT), 0) FROM (
      |       SELECT count(*) AS c FROM lineitem
      |       GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)),
      |    (SELECT n_li FROM n)
      |  UNION ALL
      |  SELECT 'ship_not_before_order',
      |    (SELECT count(*) FROM lineitem l
      |     JOIN orders o ON l.l_orderkey = o.o_orderkey
      |     WHERE l.l_shipdate < o.o_orderdate),
      |    (SELECT n_li FROM n)
      |  UNION ALL
      |  SELECT 'range_quantity_1_50',
      |    (SELECT count(*) FROM lineitem
      |     WHERE l_quantity < 1 OR l_quantity > 50),
      |    (SELECT n_li FROM n)
      |  UNION ALL
      |  SELECT 'positive_extendedprice',
      |    (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0),
      |    (SELECT n_li FROM n))
      |SELECT "check", n_violations, n_checked,
      |  CASE WHEN n_checked = 0 THEN 0
      |       ELSE CAST(CAST(n_violations AS HUGEINT) * 1000000
      |            // n_checked AS BIGINT) END AS viol_ppm
      |FROM checks""".stripMargin

  // -------------------------------------------------------------- q_motif
  /** Symbolic time-series motif discovery (the SAX idea made
    * integer-exact): each (event_type, week) becomes a 7-symbol WORD —
    * per-day symbol = whether the day's event count ranks in the
    * week's top 3 or bottom 4 (rank-based, so no mean/σ floats and no
    * cross-engine normalization drift) — and recurring weekly shapes
    * are simply words shared by ≥2 windows. Ordinal-pattern encoding
    * from the permutation-entropy literature; rank ties break by day,
    * so the word is total-order deterministic.
    *
    * Scale: this is the motif design that survives 100 TB — the
    * corpus collapses to (type, day) count cells FIRST (map-side
    * combined), ranking windows are 7-row frames partitioned by
    * (type, week), and similarity is WORD EQUALITY (one groupBy on
    * the word), never a pairwise window comparison: where a
    * distance-based motif search is O(windows²), this blocks into
    * hash buckets exactly like the MinHash band join. Samples are
    * min-aggregated, not collected, so a viral pattern with millions
    * of windows still yields one bounded row.
    */
  private def qMotif(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val wk = daily.withColumn("week",
      to_date(date_trunc("week", col("day"))))
    val full = wk.groupBy(col("event_type"), col("week"))
      .agg(count(lit(1)).as("c")).filter(col("c") === 7).drop("c")
    val ranked = wk.join(full, Seq("event_type", "week"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("week"))
          .orderBy(col("n"), col("day"))))
      .withColumn("sym", expr("((r - 1) * 2) div 7"))
    val words = ranked.groupBy(col("event_type"), col("week"))
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(day, sym))), x -> CAST(x.sym AS STRING)), '')")
        .as("pattern"))
    words.groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_windows"),
        min(concat(col("week").cast("string"), lit("|"),
          col("event_type"))).as("sample_window"))
      .filter(col("n_windows") >= 2)
  }

  private val qMotifSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |wk AS (
      |  SELECT event_type, CAST(date_trunc('week', day) AS DATE) AS week,
      |    day, n
      |  FROM daily),
      |fullw AS (
      |  SELECT event_type, week FROM wk
      |  GROUP BY 1, 2 HAVING count(*) = 7),
      |ranked AS (
      |  SELECT w.event_type, w.week, w.day,
      |    row_number() OVER (PARTITION BY w.event_type, w.week
      |                       ORDER BY w.n, w.day) AS r
      |  FROM wk w JOIN fullw f USING (event_type, week)),
      |words AS (
      |  SELECT event_type, week,
      |    string_agg(CAST(((r - 1) * 2) // 7 AS VARCHAR), ''
      |               ORDER BY day) AS pattern
      |  FROM ranked GROUP BY 1, 2)
      |SELECT pattern, count(*) AS n_windows,
      |  min(CAST(week AS VARCHAR) || '|' || event_type) AS sample_window
      |FROM words GROUP BY pattern HAVING count(*) >= 2""".stripMargin

  // ----------------------------------------------------------- q_ts_pairs
  /** Exact time-series similarity search — the distance-based
    * companion to [[qMotif]]'s symbolic blocking: top-10 most similar
    * (event_type, week) window pairs by Spearman footrule distance
    * Σ|rank_a − rank_b| over the 7 within-week count ranks.
    * Rank-based ⇒ integer-exact (no z-normalization floats) and
    * scale-free (a busy type and a quiet type with the same weekly
    * shape score as identical).
    *
    * Scale: pairwise distance IS quadratic — in the number of
    * WINDOWS, which this design makes small by construction: the
    * corpus collapses to (type, day) count cells before any pairing,
    * so the pair frame is (types × weeks)², dashboard-sized at any
    * event volume (the same pre-collapse discipline as
    * `q_changepoint`/`q_seasonality`). The join key is the
    * day-of-week index (position within the window), and the top-10
    * is TakeOrderedAndProject. When windows DO explode,
    * [[tsPairsTopK]]'s guard reroutes through qMotif's word-equality
    * blocking — the same measured-threshold switch
    * `Similarity.topKNeighbors` applies to brute-force ANN — so the
    * registered query can never plan the quadratic join on an
    * unbounded window frame.
    */
  private[graft] val TS_PAIRS_MAX_WINDOWS = 4096L

  /** Top-k most-similar window pairs by footrule over a ranked frame
    * (`w` window id, `idx` position 0..6, `r` within-window rank).
    * Counts windows first (metadata-scale vs either search): at or
    * under `maxExactWindows` the pair frame is all-pairs on `idx` —
    * exact, quadratic in windows, fine for a dashboard-sized frame.
    * Above it, windows are first blocked by their qMotif symbol WORD
    * (coarse shape equality) and the exact footrule runs only within
    * blocks — the join key becomes (word, idx), so work is
    * Σ block² ≪ windows², the MinHash-band shape. The blocked path is
    * a candidate-generation approximation (cross-shape pairs are
    * pruned), which is precisely the trade a 100 TB motif search
    * makes; the default threshold keeps every realistic dashboard
    * frame on the exact path.
    */
  private[graft] def tsPairsTopK(ranked0: DataFrame, k: Int,
      maxExactWindows: Long = TS_PAIRS_MAX_WINDOWS): DataFrame = {
    val ranked = ranked0.transform(graft.Memo.checkpoint) // guard count + pair join
    val nWindows = ranked.select(col("w")).distinct().count()
    val paired =
      if (nWindows <= maxExactWindows) {
        val a = ranked.select(col("w").as("win_a"), col("idx"),
          col("r").as("ra"))
        val b = ranked.select(col("w").as("win_b"), col("idx"),
          col("r").as("rb"))
        a.join(b, Seq("idx")).filter(col("win_a") < col("win_b"))
      } else {
        val words = ranked.groupBy(col("w"))
          .agg(expr("array_join(transform(array_sort(" +
            "collect_list(struct(idx, r)))," +
            " x -> CAST(((x.r - 1) * 2) div 7 AS STRING)), '')")
            .as("word"))
        val withWord = ranked.join(words, Seq("w"))
        val a = withWord.select(col("word"), col("w").as("win_a"),
          col("idx"), col("r").as("ra"))
        val b = withWord.select(col("word"), col("w").as("win_b"),
          col("idx"), col("r").as("rb"))
        a.join(b, Seq("word", "idx")).filter(col("win_a") < col("win_b"))
      }
    paired
      .groupBy(col("win_a"), col("win_b"))
      .agg(sum(abs(col("ra") - col("rb"))).as("footrule"))
      .orderBy(col("footrule"), col("win_a"), col("win_b"))
      .limit(k)
  }

  private def qTsPairs(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("week", to_date(date_trunc("week", col("day"))))
    val full = daily.groupBy(col("event_type"), col("week"))
      .agg(count(lit(1)).as("c")).filter(col("c") === 7).drop("c")
    val ranked = daily.join(full, Seq("event_type", "week"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("week"))
          .orderBy(col("n"), col("day"))))
      .select(
        concat(col("week").cast("string"), lit("|"), col("event_type"))
          .as("w"),
        datediff(col("day"), col("week")).as("idx"), col("r"))
    tsPairsTopK(ranked, 10)
  }

  private val qTsPairsSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |wk AS (
      |  SELECT event_type, CAST(date_trunc('week', day) AS DATE) AS week,
      |    day, n
      |  FROM daily),
      |fullw AS (
      |  SELECT event_type, week FROM wk
      |  GROUP BY 1, 2 HAVING count(*) = 7),
      |ranked AS (
      |  SELECT CAST(w.week AS VARCHAR) || '|' || w.event_type AS w,
      |    datediff('day', w.week, w.day) AS idx,
      |    row_number() OVER (PARTITION BY w.event_type, w.week
      |                       ORDER BY w.n, w.day) AS r
      |  FROM wk w JOIN fullw f USING (event_type, week))
      |SELECT a.w AS win_a, b.w AS win_b,
      |  CAST(sum(abs(a.r - b.r)) AS BIGINT) AS footrule
      |FROM ranked a JOIN ranked b ON a.idx = b.idx AND a.w < b.w
      |GROUP BY 1, 2
      |ORDER BY footrule, win_a, win_b
      |LIMIT 10""".stripMargin

  // ----------------------------------------------------------- q_autocorr
  /** Lag-k autocorrelation (k = 1..7) of daily event counts per type —
    * the diagnostic that DETECTS periodicity where `q_seasonality`
    * assumes it: a weekly cycle shows as a lag-7 peak, day-over-day
    * momentum as lag-1. Lag pairs come from a CALENDAR join
    * (prev day = day − k), not a row-offset window — the same
    * missing-day-safe alignment `q_forecast_naive` uses.
    *
    * Determinism/scale: the corpus collapses to (type, day) integer
    * count cells first; per-(type, k) sums of counts and products
    * accumulate as DECIMAL(38,0) (order-independent, overflow-safe at
    * warehouse daily volumes where n·Σx² exceeds BIGINT), and the
    * Pearson ratio is evaluated in IEEE doubles from those exact
    * integers — bit-identical on any engine/partitioning. The lag
    * frame (7 rows) broadcasts; the pair join is per-type over the
    * dashboard-sized daily frame.
    */
  private def qAutocorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val lags = s.range(1, 8).select(col("id").cast("int").as("k"))
    val cur = daily.crossJoin(broadcast(lags))
    val prev = daily.select(col("event_type"),
      col("day").as("pday"), col("n").as("pn"))
    cur.join(prev,
        cur("event_type") === prev("event_type") &&
          col("pday") === date_sub(col("day"), col("k")))
      .drop(prev("event_type"))
      .groupBy(col("event_type"), col("k"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("n").cast("decimal(38,0)")).as("sx"),
        sum(col("pn").cast("decimal(38,0)")).as("sy"),
        sum((col("n") * col("pn")).cast("decimal(38,0)")).as("sxy"),
        sum((col("n") * col("n")).cast("decimal(38,0)")).as("sxx"),
        sum((col("pn") * col("pn")).cast("decimal(38,0)")).as("syy"))
      .withColumn("r_ppm", expr(
        """CASE WHEN (n_pairs * CAST(sxx AS DOUBLE) -
          |           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
          |          (n_pairs * CAST(syy AS DOUBLE) -
          |           CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
          |     THEN NULL
          |     ELSE floor(
          |       (n_pairs * CAST(sxy AS DOUBLE) -
          |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * 1000000 /
          |       sqrt((n_pairs * CAST(sxx AS DOUBLE) -
          |             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
          |            (n_pairs * CAST(syy AS DOUBLE) -
          |             CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
          |END""".stripMargin))
      .select(col("event_type"), col("k"), col("n_pairs"), col("r_ppm"))
  }

  private val qAutocorrSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |lags AS (SELECT CAST(k AS INTEGER) AS k FROM generate_series(1, 7) t(k)),
      |pairs AS (
      |  SELECT c.event_type, l.k, c.n, p.n AS pn
      |  FROM daily c
      |  CROSS JOIN lags l
      |  JOIN daily p ON p.event_type = c.event_type
      |    AND p.day = c.day - l.k),
      |agg AS (
      |  SELECT event_type, k, count(*) AS n_pairs,
      |    SUM(CAST(n AS HUGEINT)) AS sx,
      |    SUM(CAST(pn AS HUGEINT)) AS sy,
      |    SUM(CAST(n * pn AS HUGEINT)) AS sxy,
      |    SUM(CAST(n * n AS HUGEINT)) AS sxx,
      |    SUM(CAST(pn * pn AS HUGEINT)) AS syy
      |  FROM pairs GROUP BY 1, 2)
      |SELECT event_type, k, n_pairs,
      |  CASE WHEN (n_pairs * CAST(sxx AS DOUBLE) -
      |             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |            (n_pairs * CAST(syy AS DOUBLE) -
      |             CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
      |       THEN NULL
      |       ELSE CAST(floor(
      |         (n_pairs * CAST(sxy AS DOUBLE) -
      |          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * 1000000 /
      |         sqrt((n_pairs * CAST(sxx AS DOUBLE) -
      |               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |              (n_pairs * CAST(syy AS DOUBLE) -
      |               CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
      |         AS BIGINT)
      |  END AS r_ppm
      |FROM agg""".stripMargin

  // ---------------------------------------------------------- q_cross_corr
  /** Lead–lag CROSS-correlation between event types — for every
    * ordered type pair (ta < tb) and lag k ∈ −7..7, the Pearson
    * correlation of ta's daily count with tb's count k days later
    * (k > 0: ta LEADS tb; k < 0: ta lags). The causal-direction
    * companion of [[qAutocorr]]: autocorrelation finds a series'
    * own periodicity, this finds which series moves FIRST — the
    * "views today, purchases tomorrow" readout that sizes funnels
    * and staffs fulfillment.
    *
    * Same determinism/scale discipline as [[qAutocorr]]: corpus →
    * (type, day) integer cells first; DECIMAL(38,0)/HUGEINT component
    * sums; the Pearson ratio evaluated in IEEE doubles from exact
    * integers, floored to ppm — bit-identical cross-engine. The lag
    * frame (15 rows) '''broadcasts'''; the pair join is calendar-
    * aligned (day + k), missing-day-safe; output is
    * types² · 15 rows — dashboard-sized regardless of volume.
    */
  private def qCrossCorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val lags = s.range(-7, 8).select(col("id").cast("int").as("k"))
    val a = daily.select(col("event_type").as("ta"), col("day"),
      col("n").as("xa"))
    val b = daily.select(col("event_type").as("tb"),
      col("day").as("bday"), col("n").as("xb"))
    a.crossJoin(broadcast(lags))
      .join(b,
        col("ta") < col("tb") &&
          col("bday") === expr("date_add(day, k)"))
      .groupBy(col("ta"), col("tb"), col("k"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("xa").cast("decimal(38,0)")).as("sx"),
        sum(col("xb").cast("decimal(38,0)")).as("sy"),
        sum((col("xa") * col("xb")).cast("decimal(38,0)")).as("sxy"),
        sum((col("xa") * col("xa")).cast("decimal(38,0)")).as("sxx"),
        sum((col("xb") * col("xb")).cast("decimal(38,0)")).as("syy"))
      .withColumn("r_ppm", expr(
        """CASE WHEN (n_pairs * CAST(sxx AS DOUBLE) -
          |           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
          |          (n_pairs * CAST(syy AS DOUBLE) -
          |           CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
          |     THEN NULL
          |     ELSE floor(
          |       (n_pairs * CAST(sxy AS DOUBLE) -
          |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * 1000000 /
          |       sqrt((n_pairs * CAST(sxx AS DOUBLE) -
          |             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
          |            (n_pairs * CAST(syy AS DOUBLE) -
          |             CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
          |END""".stripMargin))
      .select(col("ta"), col("tb"), col("k"), col("n_pairs"),
        col("r_ppm"))
  }

  private val qCrossCorrSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |lags AS (SELECT CAST(k AS INTEGER) AS k
      |         FROM generate_series(-7, 7) t(k)),
      |pairs AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb, l.k,
      |    a.n AS xa, b.n AS xb
      |  FROM daily a
      |  CROSS JOIN lags l
      |  JOIN daily b ON a.event_type < b.event_type
      |    AND b.day = a.day + l.k),
      |agg AS (
      |  SELECT ta, tb, k, count(*) AS n_pairs,
      |    SUM(CAST(xa AS HUGEINT)) AS sx,
      |    SUM(CAST(xb AS HUGEINT)) AS sy,
      |    SUM(CAST(xa * xb AS HUGEINT)) AS sxy,
      |    SUM(CAST(xa * xa AS HUGEINT)) AS sxx,
      |    SUM(CAST(xb * xb AS HUGEINT)) AS syy
      |  FROM pairs GROUP BY 1, 2, 3)
      |SELECT ta, tb, k, n_pairs,
      |  CASE WHEN (n_pairs * CAST(sxx AS DOUBLE) -
      |             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |            (n_pairs * CAST(syy AS DOUBLE) -
      |             CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
      |       THEN NULL
      |       ELSE CAST(floor(
      |         (n_pairs * CAST(sxy AS DOUBLE) -
      |          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * 1000000 /
      |         sqrt((n_pairs * CAST(sxx AS DOUBLE) -
      |               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |              (n_pairs * CAST(syy AS DOUBLE) -
      |               CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
      |         AS BIGINT)
      |  END AS r_ppm
      |FROM agg""".stripMargin

  // -------------------------------------------------------------- q_kanon
  /** k-anonymity audit over quasi-identifiers (Sweeney): customers
    * group into equivalence classes by (nation, market segment,
    * account-balance bucket) — the attributes a release would keep —
    * and the audit reports the class-size distribution with the
    * at-risk flag (class size < 5 ⇒ the individuals are
    * re-identifiable by joining public attributes). This is the
    * measurement step of privacy-preserving release: generalization/
    * suppression decisions are made against exactly this histogram.
    *
    * Scale: one groupBy on the QI tuple (map-side combined), then a
    * second aggregation over class sizes — the result is bounded by
    * the number of DISTINCT class sizes, not the population. No row
    * ever leaves with its identifier; only class cardinalities move.
    */
  private def qKanon(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("n_individuals",
        col("class_size") * col("n_classes"))
      .withColumn("at_risk", col("class_size") < 5)

  private val qKanonSql: String =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
      |    count(*) AS class_size
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT class_size, count(*) AS n_classes,
      |  class_size * count(*) AS n_individuals,
      |  class_size < 5 AS at_risk
      |FROM classes GROUP BY class_size""".stripMargin

  // ------------------------------------------------------------ q_benford
  /** Benford first-digit audit over order totals — the classic fraud /
    * synthetic-data screen: the distribution of leading significant
    * digits of `o_totalprice` against Benford's law
    * P(d) = log₁₀(1 + 1/d). The expectation is baked in as the nine
    * published ppm constants (exact integers on both engines — a
    * runtime log10 would put a float in the compare), the observed
    * share is `floor(1e6·c_d / N)`, and the reported deviation is
    * their absolute difference, all integer.
    *
    * Scale: map-only digit extraction (first char of the floored
    * total — totals are ≥ 1, so no sign/zero handling), one hash agg
    * with exactly 9 groups; the grand total is a 1-row frame →
    * '''broadcast''' cross join. Nothing but the scan grows with data.
    */
  private val BENFORD_PPM = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L)

  private def qBenford(s: SparkSession, d: String): DataFrame = {
    val digits = Tables.orders(s, d)
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
    val total = digits.agg(count(lit(1)).as("n_total"))
    val expArr = array(BENFORD_PPM.map(lit): _*)
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .withColumn("num", expr("CAST(n AS DECIMAL(38,0)) * 1000000"))
      .withColumn("obs_ppm", expr(
        "CAST((num - num % n_total) / n_total AS BIGINT)"))
      .withColumn("exp_ppm", element_at(expArr, col("digit")))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  private val qBenfordSql: String = {
    val arr = BENFORD_PPM.mkString("[", ", ", "]")
    s"""WITH digits AS (
       |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
       |                             AS VARCHAR), 1, 1) AS INTEGER) AS digit
       |  FROM orders),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM digits),
       |obs AS (
       |  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY 1)
       |SELECT digit, n,
       |  CAST(CAST(n AS HUGEINT) * 1000000 // n_total AS BIGINT) AS obs_ppm,
       |  CAST($arr[digit] AS BIGINT) AS exp_ppm,
       |  CAST(abs(CAST(n AS HUGEINT) * 1000000 // n_total - $arr[digit])
       |       AS BIGINT) AS dev_ppm
       |FROM obs, tot""".stripMargin
  }

  // ----------------------------------------------------------------- q_ks
  /** Two-sample Kolmogorov–Smirnov drift statistic per event type —
    * the ECDF-based companion to [[qDrift]]'s chi-square: compare the
    * early-period and late-period value distributions on the shared
    * 20-bucket grid and report D = max |ECDF_a − ECDF_b|. Integer-
    * exact: D·(n_a·n_b) = max over buckets of |cum_a·n_b − cum_b·n_a|
    * (every term an integer), reported as `ks_ppm = floor(1e6·D_scaled
    * / (n_a·n_b))` in DECIMAL(38,0) (cum·n crosses int64 at warehouse
    * counts). The bucket ECDF only changes at occupied buckets, so
    * running the max over present buckets equals the max over the
    * full grid — absent buckets can't host the supremum.
    *
    * Scale: map-only (type, bucket, period) assignment, one hash agg
    * with ≤ types×20 groups; the cumulative sums and the max run in a
    * window PARTITIONED BY event_type over a frame bounded at 20
    * rows — metadata-sized, never corpus-sized. The per-type totals
    * ride along via a broadcast join.
    */
  private def qKs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        least(greatest(floor(col("value") / BUCKET_W), lit(0L)),
          lit(N_BUCKETS - 1L)).cast("long").as("bucket"),
        when(col("ts") < lit(DRIFT_SPLIT).cast("timestamp"), 1L)
          .otherwise(0L).as("in_a"))
    val cells = ev.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("in_a")).as("a"), sum(lit(1L) - col("in_a")).as("b"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_a", sum(col("a")).over(w))
      .withColumn("cum_b", sum(col("b")).over(w))
      .join(broadcast(totals), Seq("event_type"))
      .withColumn("d_scaled", abs(
        expr("CAST(cum_a AS DECIMAL(38,0)) * n_b" +
          " - CAST(cum_b AS DECIMAL(38,0)) * n_a")))
      .groupBy(col("event_type"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("d_scaled")).as("dmax"))
      .withColumn("den", expr("CAST(n_a AS DECIMAL(38,0)) * n_b"))
      .withColumn("ks_ppm", expr(
        "CAST((dmax * 1000000 - (dmax * 1000000) % den) / den AS BIGINT)"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("ks_ppm"))
  }

  private val qKsSql: String =
    s"""WITH ev AS (
       |  SELECT event_type,
       |    CAST(least(greatest(floor(value / $BUCKET_W), 0),
       |               ${N_BUCKETS - 1}) AS BIGINT) AS bucket,
       |    CASE WHEN ts < TIMESTAMP '$DRIFT_SPLIT' THEN 1 ELSE 0 END
       |      AS in_a
       |  FROM events),
       |cells AS (
       |  SELECT event_type, bucket,
       |    CAST(sum(in_a) AS BIGINT) AS a,
       |    CAST(sum(1 - in_a) AS BIGINT) AS b
       |  FROM ev GROUP BY 1, 2),
       |tot AS (
       |  SELECT event_type, sum(a) AS n_a, sum(b) AS n_b
       |  FROM cells GROUP BY 1),
       |cum AS (
       |  SELECT event_type, bucket,
       |    sum(a) OVER (PARTITION BY event_type ORDER BY bucket) AS cum_a,
       |    sum(b) OVER (PARTITION BY event_type ORDER BY bucket) AS cum_b
       |  FROM cells),
       |sc AS (
       |  SELECT c.event_type, t.n_a, t.n_b,
       |    max(abs(CAST(c.cum_a AS HUGEINT) * t.n_b
       |            - CAST(c.cum_b AS HUGEINT) * t.n_a)) AS dmax
       |  FROM cum c JOIN tot t USING (event_type)
       |  GROUP BY 1, 2, 3)
       |SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
       |  CAST(n_b AS BIGINT) AS n_b,
       |  CAST(dmax * 1000000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
       |    AS ks_ppm
       |FROM sc""".stripMargin

  // --------------------------------------------------------------- q_gini
  /** Gini concentration of customer spend — the inequality readout a
    * revenue or corpus-contribution dashboard tracks, computed from
    * the BINNED Lorenz curve: customers bucketed by exact-decimal
    * lifetime spend into fixed 25 k-wide classes, then the grouped-
    * data Gini `1 − Σ n_i·(S_{i−1}+S_i) / (N·S)` over the ≤20-class
    * histogram (the standard binned estimator — a lower bound of the
    * exact Gini, tight when bins are narrow; documented contract).
    * Spend sums run in DECIMAL(18,2) (float addition would be
    * order-dependent), the Lorenz products in DECIMAL(38,6), and the
    * result floors to ppm — bit-identical cross-engine.
    *
    * Scale: this shape exists precisely so NO global sort over
    * customers happens (the exact Gini needs every customer ranked —
    * a single-partition window at warehouse scale): one customer agg,
    * one ≤20-group bucket agg, cumulative sums over the BOUNDED
    * bucket frame, one 1-row reduce.
    */
  private val GINI_BUCKET_W = 25000L
  private val GINI_BUCKETS = 20L

  private def qGini(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Integer CENTS from the first agg on — every later product and
    // quotient is DECIMAL(38,0)-exact (HUGEINT on the oracle side).
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100" +
        " AS DECIMAL(38,0))").as("spend_c"))
    val buckets = spend
      .withColumn("bucket",
        least(expr(s"CAST(spend_c div ${GINI_BUCKET_W * 100} AS BIGINT)"),
          lit(GINI_BUCKETS - 1L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_i"), sum(col("spend_c")).as("s_i"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("cum_s", sum(col("s_i")).over(w))
      .agg(sum(col("n_i")).as("n_customers"),
        sum(col("s_i")).cast("decimal(38,0)").as("total_c"),
        sum(expr("CAST(n_i AS DECIMAL(38,0)) * (2 * cum_s - s_i)"))
          .cast("decimal(38,0)").as("lorenz"))
      .withColumn("den",
        expr("CAST(n_customers AS DECIMAL(38,0)) * total_c"))
      .withColumn("num", expr("(den - lorenz) * 1000000"))
      .withColumn("gini_ppm",
        expr("CAST((num - num % den) / den AS BIGINT)"))
      .select(col("n_customers"), col("total_c").cast("long").as("total_c"),
        col("gini_ppm"))
  }

  private val qGiniSql: String =
    s"""WITH spend AS (
       |  SELECT o_custkey,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS HUGEINT)
       |      AS spend_c
       |  FROM orders GROUP BY 1),
       |buckets AS (
       |  SELECT least(CAST(spend_c // ${GINI_BUCKET_W * 100} AS BIGINT),
       |               ${GINI_BUCKETS - 1}) AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_i,
       |    sum(spend_c) AS s_i
       |  FROM spend GROUP BY 1),
       |cum AS (
       |  SELECT *, sum(s_i) OVER (ORDER BY bucket) AS cum_s FROM buckets),
       |agg AS (
       |  SELECT CAST(sum(n_i) AS BIGINT) AS n_customers,
       |    CAST(sum(s_i) AS HUGEINT) AS total_c,
       |    CAST(sum(CAST(n_i AS HUGEINT) * (2 * cum_s - s_i)) AS HUGEINT)
       |      AS lorenz
       |  FROM cum)
       |SELECT n_customers, CAST(total_c AS BIGINT) AS total_c,
       |  CAST((CAST(n_customers AS HUGEINT) * total_c - lorenz) * 1000000
       |       // (CAST(n_customers AS HUGEINT) * total_c) AS BIGINT)
       |    AS gini_ppm
       |FROM agg""".stripMargin

  // ---------------------------------------------------------- q_theil_sen
  /** Theil–Sen robust trend per event type — the median of all
    * pairwise day-to-day slopes of the daily event count, the
    * outlier-proof alternative to least-squares for "is this metric
    * trending" monitoring. Slopes are integer ppm/day
    * (`1e6·(c_j−c_i) div'ed by (day_j−day_i)` with the repo's
    * truncate-toward-zero `(n − n % d)/d` idiom — both engines
    * truncate identically for negative numerators), and the median
    * is the LOWER median (element ⌈m/2⌉ of the sorted slope list) so
    * the result stays integer — documented contract.
    *
    * Scale: the pairwise self-join and the ranking window are both
    * PARTITIONED BY event_type over the DAILY frame — days are
    * calendar-bounded (≤31 here, ≤365/yr), so pairs are ≤ d·(d−1)/2
    * per type regardless of corpus size. Everything below the daily
    * rollup is one hash agg on (type, day).
    */
  private def qTheilSen(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val pairs = daily.alias("i")
      .join(daily.alias("j"),
        col("i.event_type") === col("j.event_type") &&
          col("i.day") < col("j.day"))
      .select(col("i.event_type").as("event_type"),
        (col("j.c") - col("i.c")).as("dc"),
        datediff(col("j.day"), col("i.day")).cast("long").as("dd"))
      .withColumn("num", expr("CAST(1000000 AS DECIMAL(38,0)) * dc"))
      .withColumn("slope_ppm",
        expr("CAST((num - num % dd) / dd AS BIGINT)"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("slope_ppm"), col("dc"), col("dd"))
    pairs
      .withColumn("rk", row_number().over(w))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("rk") === expr("(m + 1) div 2"))
      .select(col("event_type"), col("m").as("n_pairs"),
        col("slope_ppm").as("slope_ppm_med"))
  }

  private val qTheilSenSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT i.event_type,
      |    j.c - i.c AS dc,
      |    CAST(j.day - i.day AS BIGINT) AS dd
      |  FROM daily i JOIN daily j
      |    ON i.event_type = j.event_type AND i.day < j.day),
      |slopes AS (
      |  SELECT event_type, dc, dd,
      |    CAST((CAST(1000000 AS HUGEINT) * dc
      |          - (CAST(1000000 AS HUGEINT) * dc) % dd) // dd AS BIGINT)
      |      AS slope_ppm
      |  FROM pairs),
      |ranked AS (
      |  SELECT event_type, slope_ppm,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY slope_ppm, dc, dd) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS m
      |  FROM slopes)
      |SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
      |  slope_ppm AS slope_ppm_med
      |FROM ranked WHERE rk = (m + 1) // 2""".stripMargin

  // --------------------------------------------------------- q_concurrency
  /** Peak concurrency per day — the capacity-planning readout (how
    * many users are active AT ONCE, not per day): each user's daily
    * presence interval [first event, last event] at minute
    * resolution, swept with the classic +1/−1 boundary-event prefix
    * sum; the day's peak is the max running occupancy, reported with
    * the earliest minute attaining it.
    *
    * Scale: this is the INTERVAL-SWEEP shape — never an interval
    * self-join (quadratic on busy days): one (user, day) hash agg
    * collapses the corpus to per-user intervals, boundary deltas
    * aggregate to ≤1440 minute cells per day, and the running sum +
    * argmax run in windows PARTITIONED BY day over that calendar-
    * bounded frame. Nothing past the first agg scales with volume.
    */
  private def qConcurrency(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min((hour(col("ts")) * 60 + minute(col("ts"))).cast("long"))
        .as("m_in"),
        max((hour(col("ts")) * 60 + minute(col("ts"))).cast("long"))
          .as("m_out"))
    val deltas = iv.select(col("day"), col("m_in").as("minute"),
        lit(1L).as("delta"))
      .unionAll(iv.select(col("day"), (col("m_out") + 1L).as("minute"),
        lit(-1L).as("delta")))
      .groupBy(col("day"), col("minute"))
      .agg(sum(col("delta")).as("d"))
    val w = Window.partitionBy(col("day")).orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val occ = deltas.withColumn("occ", sum(col("d")).over(w))
    occ
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("day"))
          .orderBy(col("occ").desc, col("minute"))))
      .filter(col("rk") === 1)
      .select(col("day"), col("occ").as("max_concurrent"),
        col("minute").as("at_minute"))
  }

  private val qConcurrencySql: String =
    """WITH iv AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(min(hour(ts) * 60 + minute(ts)) AS BIGINT) AS m_in,
      |    CAST(max(hour(ts) * 60 + minute(ts)) AS BIGINT) AS m_out
      |  FROM events GROUP BY 1, 2),
      |deltas AS (
      |  SELECT day, minute, CAST(sum(delta) AS BIGINT) AS d FROM (
      |    SELECT day, m_in AS minute, 1 AS delta FROM iv
      |    UNION ALL
      |    SELECT day, m_out + 1 AS minute, -1 AS delta FROM iv)
      |  GROUP BY 1, 2),
      |occ AS (
      |  SELECT day, minute,
      |    sum(d) OVER (PARTITION BY day ORDER BY minute) AS occ
      |  FROM deltas)
      |SELECT day, CAST(occ AS BIGINT) AS max_concurrent,
      |  minute AS at_minute
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY day
      |                               ORDER BY occ DESC, minute) AS rk
      |  FROM occ)
      |WHERE rk = 1""".stripMargin

  // -------------------------------------------------------- q_l_diversity
  /** l-diversity audit — the follow-up [[qKanon]] needs: k-anonymity
    * bounds re-identification but a class whose members all share one
    * SENSITIVE value still leaks it (homogeneity attack; Machanavajjhala
    * et al. 2007). Per quasi-identifier class (nation × balance
    * bucket), l = distinct sensitive values (market segment); report
    * the l histogram with class/member counts and the l < 3 at-risk
    * flag.
    *
    * Scale: ONE class-keyed aggregation with a SINGLE distinct (the
    * two-phase partial-distinct plan — the multi-distinct Expand that
    * [[qProfile]] documents never appears with one distinct agg),
    * then a metadata-sized l-histogram agg; distinct segments per
    * class are bounded by the segment domain.
    */
  private def qLDiversity(s: SparkSession, d: String): DataFrame = {
    val members = Tables.customer(s, d)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"),
        col("c_mktsegment"))
    val classes = members
      .groupBy(col("c_nationkey"), col("bal_bucket"))
      .agg(count(lit(1)).as("n_members"),
        count_distinct(col("c_mktsegment")).as("l"))
    classes.groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n_members")).as("n_members"))
      .withColumn("at_risk", col("l") < 3)
  }

  private val qLDiversitySql: String =
    """WITH classes AS (
      |  SELECT c_nationkey,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
      |    CAST(count(*) AS BIGINT) AS n_members,
      |    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
      |  FROM customer GROUP BY 1, 2)
      |SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
      |  CAST(sum(n_members) AS BIGINT) AS n_members,
      |  l < 3 AS at_risk
      |FROM classes GROUP BY l""".stripMargin

  // --------------------------------------------------------- q_tcloseness
  /** t-closeness audit — the third rung of the privacy ladder after
    * [[qKanon]] (class sizes) and [[qLDiversity]] (distinct sensitive
    * values): a class can be large AND diverse yet still leak if its
    * sensitive-value DISTRIBUTION deviates from the corpus — skewness
    * attack (Li, Li & Venkatasubramanian 2007). Per quasi-identifier
    * class (nation × balance bucket), t = total-variation distance
    * between the class's market-segment distribution and the global
    * one, in integer ppm (`Σ|p−q| div 2` over ppm shares — the
    * [[graft.llm.Mixing]] q_source_sim metric applied to privacy),
    * with the t > 0.3 at-risk flag.
    *
    * Scale: one (class, segment) aggregation collapses the
    * population; the segment-domain grid comes from a '''broadcast'''
    * of the segment-sized global frame against the class frame —
    * absent (class, segment) cells materialize with p = 0 so their
    * global mass counts (skipping them understates t). Output is
    * class-count-sized (QI domain), never population-sized.
    */
  private def qTcloseness(s: SparkSession, d: String): DataFrame = {
    val members = Tables.customer(s, d)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"),
        col("c_mktsegment"))
    val cc = members
      .groupBy(col("c_nationkey"), col("bal_bucket"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
    val ct = cc.groupBy(col("c_nationkey"), col("bal_bucket"))
      .agg(sum(col("cnt")).as("n_members"))
    val gs = cc.groupBy(col("c_mktsegment")).agg(sum(col("cnt")).as("g"))
    val n = gs.agg(sum(col("g")).as("n"))
    val gshare = gs.crossJoin(broadcast(n))
      .select(col("c_mktsegment"), expr("g * 1000000 div n").as("q_ppm"))
    ct.crossJoin(broadcast(gshare))
      .join(cc, Seq("c_nationkey", "bal_bucket", "c_mktsegment"), "left")
      .select(col("c_nationkey"), col("bal_bucket"), col("n_members"),
        col("q_ppm"),
        expr("coalesce(cnt, CAST(0 AS BIGINT)) * 1000000" +
          " div n_members").as("p_ppm"))
      .groupBy(col("c_nationkey"), col("bal_bucket"), col("n_members"))
      // `div`, not `/`: Spark's double cast truncates where DuckDB's
      // rounds — integer floor division sidesteps the disagreement.
      .agg(sum(abs(col("p_ppm") - col("q_ppm"))).as("s2"))
      .select(col("c_nationkey"), col("bal_bucket"), col("n_members"),
        expr("s2 div 2").as("t_ppm"))
      .withColumn("at_risk", col("t_ppm") > 300000)
  }

  private val qTclosenessSql: String =
    """WITH m AS (
      |  SELECT c_nationkey,
      |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
      |    c_mktsegment
      |  FROM customer),
      |cc AS (
      |  SELECT c_nationkey, bal_bucket, c_mktsegment,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM m GROUP BY 1, 2, 3),
      |ct AS (
      |  SELECT c_nationkey, bal_bucket, CAST(sum(cnt) AS BIGINT)
      |    AS n_members
      |  FROM cc GROUP BY 1, 2),
      |gs AS (
      |  SELECT c_mktsegment, CAST(sum(cnt) AS BIGINT) AS g
      |  FROM cc GROUP BY 1),
      |gshare AS (
      |  SELECT c_mktsegment,
      |    CAST(g * 1000000 // (SELECT sum(g) FROM gs) AS BIGINT) AS q_ppm
      |  FROM gs),
      |grid AS (
      |  SELECT ct.c_nationkey, ct.bal_bucket, ct.n_members,
      |    gshare.c_mktsegment, gshare.q_ppm,
      |    CAST(coalesce(cc.cnt, 0) * 1000000 // ct.n_members AS BIGINT)
      |      AS p_ppm
      |  FROM ct CROSS JOIN gshare
      |  LEFT JOIN cc ON cc.c_nationkey = ct.c_nationkey
      |    AND cc.bal_bucket = ct.bal_bucket
      |    AND cc.c_mktsegment = gshare.c_mktsegment)
      |SELECT c_nationkey, bal_bucket, n_members,
      |  CAST(sum(abs(p_ppm - q_ppm)) // 2 AS BIGINT) AS t_ppm,
      |  CAST(sum(abs(p_ppm - q_ppm)) // 2 AS BIGINT) > 300000 AS at_risk
      |FROM grid GROUP BY 1, 2, 3""".stripMargin

  // ----------------------------------------------------- q_time_to_convert
  /** Conversion-latency histogram — the "how long from first view to
    * first purchase" readout that sits beside [[qFunnel]]'s stage
    * counts (the funnel says HOW MANY converted; this says HOW FAST):
    * per user, the first `view` and the first `purchase` STRICTLY
    * after it, lag bucketed in whole hours (µs-exact `unix_micros` ≡
    * `epoch_us` arithmetic, `div` to hours — no timestamp subtraction
    * semantics to disagree on), capped at [[TTC_CAP_H]]; viewers who
    * never converted land in bucket −1 — the histogram partitions the
    * viewing population.
    *
    * Scale: first-view frame = one filtered user-keyed min agg; the
    * qualifying-purchase min is a second agg over the purchase rows
    * joined user-keyed onto it (both shuffles hash on user_id, the
    * join rides the agg exchange); the histogram is a ≤cap+2-group
    * agg with map-side partials. No window, no self-join over raw
    * events.
    */
  private val TTC_CAP_H = 72L

  private def qTimeToConvert(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("v_us"))
    val firstConv = ev.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("ts_us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("p_us"))
    firstView.join(firstConv, Seq("user_id"), "left")
      .withColumn("lag_h",
        when(col("p_us").isNull, lit(-1L))
          .otherwise(least(expr("(p_us - v_us) div 3600000000"),
            lit(TTC_CAP_H))))
      .groupBy(col("lag_h")).agg(count(lit(1)).as("n_users"))
  }

  private val qTimeToConvertSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       |fv AS (
       |  SELECT user_id, min(ts_us) AS v_us FROM ev
       |  WHERE event_type = 'view' GROUP BY 1),
       |fc AS (
       |  SELECT ev.user_id, min(ev.ts_us) AS p_us
       |  FROM ev JOIN fv USING (user_id)
       |  WHERE ev.event_type = 'purchase' AND ev.ts_us > fv.v_us
       |  GROUP BY 1)
       |SELECT CASE WHEN p_us IS NULL THEN -1
       |            ELSE least((p_us - v_us) // 3600000000, $TTC_CAP_H)
       |       END AS lag_h,
       |  CAST(count(*) AS BIGINT) AS n_users
       |FROM fv LEFT JOIN fc USING (user_id)
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q_funnel_window
  /** Time-BOUNDED funnel (the ClickHouse `windowFunnel` contract):
    * view → click → purchase where every later stage must land within
    * [[FUNNEL_WINDOW_H]] hours of the user's FIRST VIEW (and strictly
    * after the previous stage). [[qFunnel]] answers "did they ever
    * convert"; this answers "did the SESSION convert" — the
    * campaign-attribution window marketers actually buy. Emits users
    * per stage plus the conversion share of viewers in ppm.
    *
    * Scale: same three user-keyed aggregations as [[qFunnel]] (the
    * window bound is a filter on the qualifying join, not a new
    * shuffle); stage frame stays user-sized, output is 3 rows.
    */
  private val FUNNEL_WINDOW_H = 24L

  private def qFunnelWindow(s: SparkSession, d: String): DataFrame = {
    val win = FUNNEL_WINDOW_H * 3600L * 1000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("tv") && col("us") <= col("tv") + win)
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("tc"), first(col("tv")).as("tv2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") > col("tc") && col("us") <= col("tv2") + win)
      .groupBy(col("user_id")).agg(min(col("us")).as("tp"))
    val staged = v
      .join(c.select(col("user_id"), lit(1).as("hc")), Seq("user_id"),
        "left")
      .join(p.select(col("user_id"), lit(1).as("hp")), Seq("user_id"),
        "left")
      .select((lit(1) + coalesce(col("hc"), lit(0))
        + coalesce(col("hp"), lit(0))).as("funnel_stage"))
    val tot = staged.agg(count(lit(1)).as("n_viewers"))
    staged.groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("funnel_stage"), col("n_users"),
        expr("n_users * 1000000 div n_viewers").as("share_ppm"))
  }

  private val qFunnelWindowSql: String = {
    val win = FUNNEL_WINDOW_H * 3600L * 1000000L
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       |v AS (
       |  SELECT user_id, min(us) AS tv FROM ev
       |  WHERE event_type = 'view' GROUP BY 1),
       |c AS (
       |  SELECT ev.user_id, min(ev.us) AS tc, min(v.tv) AS tv2
       |  FROM ev JOIN v USING (user_id)
       |  WHERE ev.event_type = 'click' AND ev.us > v.tv
       |    AND ev.us <= v.tv + $win
       |  GROUP BY 1),
       |p AS (
       |  SELECT ev.user_id, min(ev.us) AS tp
       |  FROM ev JOIN c USING (user_id)
       |  WHERE ev.event_type = 'purchase' AND ev.us > c.tc
       |    AND ev.us <= c.tv2 + $win
       |  GROUP BY 1),
       |staged AS (
       |  SELECT 1 + (c.user_id IS NOT NULL)::INT
       |    + (p.user_id IS NOT NULL)::INT AS funnel_stage
       |  FROM v
       |  LEFT JOIN c ON c.user_id = v.user_id
       |  LEFT JOIN p ON p.user_id = v.user_id)
       |SELECT funnel_stage, CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(count(*) * 1000000 // (SELECT count(*) FROM staged)
       |       AS BIGINT) AS share_ppm
       |FROM staged GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------ q_ltv_cohort
  /** Cohort LTV curves — the monetary upgrade of [[qCohort]]'s
    * presence matrix: users cohorted by FIRST-PURCHASE week, each
    * (cohort, week-offset) cell carries active buyers, exact cents
    * ([[graft.Det.money2]] discipline on event value), the CUMULATIVE
    * cohort revenue, and cumulative cents per cohort member — the
    * curve whose plateau is the LTV a growth team discounts CAC
    * against.
    *
    * Scale: one user-keyed min-agg (cohort assignment) joined back
    * co-partitioned, one (cohort, offset) cell agg; the cumulative
    * window is COHORT-partitioned over the offset frame — bounded by
    * the CALENDAR (weeks since cohort start), not by users or events.
    * Cohort sizes ride the same cell frame (offset-0 active count =
    * cohort size by construction: week 0 contains every member's
    * first purchase).
    */
  private def qLtvCohort(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buys = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000 div 7").as("w"),
        (graft.Det.money2(col("value")) * 100).cast("long").as("cents"))
    val cohort = buys.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
    val cells = buys.join(cohort, Seq("user_id"))
      .groupBy(col("cw"), (col("w") - col("cw")).as("offset_w"))
      .agg(count_distinct(col("user_id")).as("n_active"),
        sum(col("cents")).as("cents"))
    val sizes = cohort.groupBy(col("cw"))
      .agg(count(lit(1)).as("cohort_size"))
    val sized = cells.join(broadcast(sizes), Seq("cw"))
    sized
      .withColumn("cum_cents", sum(col("cents")).over(
        Window.partitionBy(col("cw")).orderBy(col("offset_w"))))
      .select(col("cw").as("cohort_w"), col("offset_w"),
        col("cohort_size"), col("n_active"), col("cents"),
        col("cum_cents"),
        expr("cum_cents div cohort_size").as("cum_per_user_cents"))
  }

  private val qLtvCohortSql: String =
    """WITH buys AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS w,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |cohort AS (
      |  SELECT user_id, min(w) AS cw FROM buys GROUP BY 1),
      |cells AS (
      |  SELECT c.cw, b.w - c.cw AS offset_w,
      |    CAST(count(DISTINCT b.user_id) AS BIGINT) AS n_active,
      |    CAST(sum(b.cents) AS BIGINT) AS cents
      |  FROM buys b JOIN cohort c USING (user_id)
      |  GROUP BY 1, 2),
      |sizes AS (
      |  SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
      |  FROM cohort GROUP BY 1)
      |SELECT cells.cw AS cohort_w, offset_w, cohort_size, n_active,
      |  cents,
      |  CAST(sum(cents) OVER (PARTITION BY cells.cw ORDER BY offset_w)
      |       AS BIGINT) AS cum_cents,
      |  CAST(CAST(sum(cents) OVER (PARTITION BY cells.cw
      |                             ORDER BY offset_w) AS BIGINT)
      |       // cohort_size AS BIGINT) AS cum_per_user_cents
      |FROM cells JOIN sizes ON sizes.cw = cells.cw""".stripMargin

  // ---------------------------------------------------------------- q_fano
  /** Burstiness audit — the Fano factor (variance-to-mean ratio) of
    * daily event counts per type: F ≈ 1 is Poisson-like arrival
    * (healthy organic traffic), F ≫ 1 is bursty (incidents, batch
    * replays, bot storms), F ≪ 1 is suspiciously regular (synthetic
    * or rate-limited). The dispersion companion to [[qAutocorr]]
    * (periodicity) and [[qChangepoint]] (level shifts). Integer-
    * exact: with daily counts x over n days, F·10⁶ =
    * `(n·Σx² − (Σx)²)·10⁶ div ((n−1)·Σx)` — sample variance over
    * mean, denominators cleared, all in DECIMAL(38,0)/HUGEINT
    * (n·Σx² crosses int64 at warehouse volumes).
    *
    * Scale: one (type, day) hash agg collapses the corpus, then one
    * ≤types-group agg of the component sums. Nothing but the scan
    * grows with volume.
    */
  private def qFano(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .withColumn("num", expr(
        "(CAST(n_days AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000"))
      .filter(col("n_days") > 1) // sample variance undefined on one day
      .withColumn("den", expr("CAST(n_days - 1 AS DECIMAL(38,0)) * sx"))
      .withColumn("fano_ppm",
        expr("CAST((num - num % den) / den AS BIGINT)"))
      .select(col("event_type"), col("n_days"), col("sx").as("n_events"),
        col("fano_ppm"))

  private val qFanoSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |comp AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT event_type, n_days, sx AS n_events,
      |  CAST((CAST(n_days AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
      |       * 1000000
      |       // (CAST(n_days - 1 AS HUGEINT) * sx) AS BIGINT) AS fano_ppm
      |FROM comp WHERE n_days > 1""".stripMargin

  // ------------------------------------------------------------ q_bootstrap
  /** Poisson bootstrap of the mean order value — THE way to put a
    * confidence interval on a 100 TB statistic in ONE pass: classical
    * bootstrap resamples n rows with replacement B times (B extra
    * passes, a per-replicate global sample), but for large n the
    * multinomial replicate weights converge to independent
    * Poisson(1), so every row can draw its B weights LOCALLY from a
    * deterministic hash and all B replicates accumulate in the same
    * map-side pass (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012). Here: B = [[BOOT_B]]
    * replicas, weight ∈ {0,1,2,3} by the truncated-Poisson ppm
    * thresholds (367879/735759/919699 = e⁻¹ cumulative masses) on an
    * integer hash of (orderkey, replica) — no RNG, bit-identical
    * cross-engine; the affine draw is passed through the q²+q mod P
    * squaring (the q_hll lesson: affine alone leaves consecutive
    * replicas on an arithmetic progression, correlating their weights
    * and biasing the spread a CI reads off); replicate mean in exact
    * integer cents via floor division. Output: one row per replica
    * (its deviation from the point estimate IS the bootstrap
    * distribution a CI reads off).
    *
    * Scale: the explode is ×B map-side work with NO extra input pass;
    * the aggregation has exactly B groups (partials collapse
    * map-side), the point estimate is a 1-row '''broadcast'''.
    * Nothing scales with volume but the one scan.
    */
  private val BOOT_B = 32
  private val BOOT_P = 1000000007L
  private val BOOT_A = 747796405L
  private val BOOT_C = 40503L

  private def qBootstrap(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
    val point = base.agg(count(lit(1)).as("n"),
      sum(expr("CAST(cents AS DECIMAL(38,0))")).as("sc"))
      .select(expr("CAST((sc - sc % n) / n AS BIGINT)").as("point_mean_c"))
    base
      .select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(1), lit(BOOT_B))).as("replica"))
      .withColumn("q", expr(
        s"((o_orderkey % $BOOT_P) * $BOOT_A + replica * $BOOT_C)" +
          s" % $BOOT_P"))
      .withColumn("u", expr(s"((q * q + q) % $BOOT_P) % 1000000"))
      .withColumn("w", expr(
        "CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1" +
          " WHEN u < 919699 THEN 2 ELSE 3 END"))
      .groupBy(col("replica"))
      .agg(sum(col("w")).as("n_eff"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * cents")).as("wc"))
      .withColumn("mean_c", expr("CAST((wc - wc % n_eff) / n_eff AS BIGINT)"))
      .crossJoin(broadcast(point))
      .select(col("replica"), col("n_eff"), col("mean_c"),
        col("point_mean_c"),
        (col("mean_c") - col("point_mean_c")).as("dev_c"))
  }

  private val qBootstrapSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM orders),
       |pt AS (
       |  SELECT CAST(sum(CAST(cents AS HUGEINT)) // count(*) AS BIGINT)
       |    AS point_mean_c
       |  FROM base),
       |drawn AS (
       |  SELECT cents, replica, ((q * q + q) % $BOOT_P) % 1000000 AS u
       |  FROM (
       |    SELECT b.cents, r.replica,
       |      ((b.o_orderkey % $BOOT_P) * $BOOT_A + r.replica * $BOOT_C)
       |        % $BOOT_P AS q
       |    FROM base b
       |    CROSS JOIN (SELECT unnest(generate_series(1, $BOOT_B))
       |                AS replica) r)),
       |rep AS (
       |  SELECT replica,
       |    CAST(sum(CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
       |                  WHEN u < 919699 THEN 2 ELSE 3 END) AS BIGINT)
       |      AS n_eff,
       |    sum(CAST(CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
       |                  WHEN u < 919699 THEN 2 ELSE 3 END AS HUGEINT)
       |        * cents) AS wc
       |  FROM drawn GROUP BY 1)
       |SELECT CAST(replica AS INTEGER) AS replica, n_eff,
       |  CAST(wc // n_eff AS BIGINT) AS mean_c,
       |  point_mean_c,
       |  CAST(wc // n_eff AS BIGINT) - point_mean_c AS dev_c
       |FROM rep, pt""".stripMargin

  // ----------------------------------------------------------------- q_rfm
  /** RFM segmentation — the classic customer-value grid: per customer,
    * Recency (last order day), Frequency (order count), Monetary
    * (exact total cents via [[graft.Det.money2]]), each quintiled
    * 1 (best) … 5, then the 125-cell segment grid with counts and
    * exact total spend. The marketing-side complement of
    * [[qDecileLift]]'s single-score gains table.
    *
    * Quintile assignment replicates `ntile(5)` BIT-IDENTICALLY with
    * NO global window (the [[qDecileLift]] discipline): each metric's
    * value histogram is domain-bounded — order days by the calendar,
    * order counts by activity, spend by the DOLLAR domain (monetary
    * ranks at whole-dollar resolution — ties inside a dollar break by
    * custkey; sub-dollar rank resolution on a quintile cut is noise
    * by construction) — so "customers strictly better" comes from a
    * TWO-LEVEL prefix over the histogram (cross-shard prefix on the
    * ≤domain/1024 shard frame + a shard-partitioned cumulative
    * window; linear where a non-equi histogram self-join is
    * quadratic in distinct values), the global rank is that prefix +
    * a row_number WITHIN the value group (value-partitioned window,
    * one shuffle, never single-partition), and the tile falls out by
    * the exact ntile arithmetic: with q = n div 5, r = n mod 5,
    * tiles 1..r hold q+1 rows.
    *
    * Scale: three value-partitioned shuffles of the customer frame +
    * three broadcast histograms; the output is the ≤125-row grid.
    */
  private def qRfm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, d)
      .select(col("o_custkey"),
        // o_orderdate arrives TIMESTAMP_NTZ (isAdjustedToUTC=false
        // parquet); the session runs UTC, so reinterpreting the naive
        // wall-clock as UTC matches DuckDB's epoch_us exactly (the
        // Tables.events normalization rationale).
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
        (graft.Det.money2(col("o_totalprice")) * 100).cast("long")
          .as("cents"))
    // Eagerly materialized: every tile histogram and every rank join
    // reads this frame (6 consumers), so a lazy plan re-evaluates the
    // orders aggregation per consumer. The frame is customer-sized;
    // it is the ONLY checkpoint in the query (tile outputs chain
    // lazily — see tile5).
    val users = o.groupBy(col("o_custkey"))
      .agg(max(expr("ts_us div 86400000000")).as("r_day"),
        count(lit(1)).as("f_cnt"),
        sum(col("cents")).as("m_cents"))
      .withColumn("m_dollars", expr("m_cents div 100"))
      .transform(graft.Memo.checkpoint)
    val tot = users.agg(count(lit(1)).as("n"))
    // ntile(5) by `metric` DESC (tie: custkey) without a global window.
    // "Customers strictly better" is a TWO-LEVEL prefix (the q_pack
    // shard trick), not an O(h²) histogram self-join: the value
    // histogram can be large (whole-dollar spend), so the cross-shard
    // prefix runs over the ≤domain/1024 shard frame and the
    // within-shard prefix is a shard-partitioned cumulative window —
    // both linear, where the naive non-equi self-join is quadratic in
    // distinct values (measured: 6.8 s → sub-second at sf0.1).
    //
    // Every histogram reads USERS, not the previous tile's output —
    // the three tile passes chain as three value-partitioned windows
    // + three broadcast rank maps inside one action, with no per-tile
    // checkpoint and no re-evaluation blowup. The round-10 sf1 job
    // profile of this query: ~30 jobs, every one under 0.45 s, cost
    // dominated by broadcast-map builds and AQE stage scheduling on a
    // customer-scale frame — overhead that SHRINKS relative to data
    // work at the next decade, and the reason its wall time wobbles
    // ±0.5 s with host load (the r8/r9 "drift"). A single shared
    // long-form rank map was tried and measured SLOWER (the metric-id
    // predicate is pushed into each build side, splitting the shared
    // broadcast back into three).
    def tile5(in: DataFrame, metric: String, out: String): DataFrame = {
      val hist = users.groupBy(col(metric)).agg(count(lit(1)).as("cnt"))
        .withColumn("shard", expr(s"$metric div 1024"))
      val shardTot = hist.groupBy(col("shard"))
        .agg(sum(col("cnt")).as("scnt"))
      val shardHigher = shardTot.alias("a")
        .join(broadcast(shardTot.alias("b")),
          col("b.shard") > col("a.shard"), "left")
        .groupBy(col("a.shard").as("shard"))
        .agg(coalesce(sum(col("b.scnt")), lit(0L)).as("sh"))
      val higher = hist
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("shard"))
            .orderBy(col(metric).desc)))
        .join(broadcast(shardHigher), Seq("shard"))
        .select(col(metric),
          (col("sh") + col("cum") - col("cnt")).as("n_higher"))
      in.join(broadcast(higher), Seq(metric))
        .withColumn("rnk", col("n_higher") + row_number().over(
          Window.partitionBy(col(metric)).orderBy(col("o_custkey"))))
        .crossJoin(broadcast(tot))
        .withColumn(out, expr(
          """CAST(IF(rnk <= (n % 5) * (n div 5 + 1),
            |  (rnk + n div 5) div (n div 5 + 1),
            |  n % 5 + (rnk - (n % 5) * (n div 5 + 1)
            |           + n div 5 - 1) div (n div 5))
            |AS INT)""".stripMargin.replace("\n", " ")))
        .drop("n_higher", "rnk", "n", "shard")
    }
    val scored = tile5(tile5(tile5(users,
      "r_day", "r_tile"), "f_cnt", "f_tile"), "m_dollars", "m_tile")
    scored.groupBy(col("r_tile"), col("f_tile"), col("m_tile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("m_cents")).as("sum_cents"))
      .select(col("r_tile"), col("f_tile"), col("m_tile"),
        col("n_customers"), col("sum_cents").cast("long").as("sum_cents"))
  }

  private val qRfmSql: String =
    """WITH u AS (
      |  SELECT o_custkey,
      |    max(epoch_us(o_orderdate) // 86400000000) AS r_day,
      |    CAST(count(*) AS BIGINT) AS f_cnt,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |             AS BIGINT)) AS BIGINT) AS m_cents
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT o_custkey,
      |    ntile(5) OVER (ORDER BY r_day DESC, o_custkey) AS r_tile,
      |    ntile(5) OVER (ORDER BY f_cnt DESC, o_custkey) AS f_tile,
      |    ntile(5) OVER (ORDER BY m_cents // 100 DESC, o_custkey)
      |      AS m_tile,
      |    m_cents
      |  FROM u)
      |SELECT CAST(r_tile AS INTEGER) AS r_tile,
      |  CAST(f_tile AS INTEGER) AS f_tile,
      |  CAST(m_tile AS INTEGER) AS m_tile,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(m_cents) AS BIGINT) AS sum_cents
      |FROM t GROUP BY 1, 2, 3""".stripMargin

  // -------------------------------------------------------- q_kaplan_meier
  /** Kaplan–Meier survival curve of user retention — per weekly
    * interval: users at risk, churn events, right-censorings, and the
    * product-limit survival estimate in integer ppm. A user's clock
    * starts at their first event; they CHURN at their last event's
    * week if that last event predates the corpus horizon by more than
    * [[KM_GAP_DAYS]] (they had time to return and didn't), otherwise
    * they are right-CENSORED at the horizon — the textbook estimator
    * (Kaplan & Meier 1958) with the engine's determinism discipline:
    * S_t = S_{t−1}·(n_t − d_t) div n_t in BIGINT ppm, floor division
    * at every step, so the curve is bit-identical on any engine and
    * any partitioning (the float cumprod is order-stable only by
    * luck).
    *
    * The sequential recurrence runs as a RECURSIVE CTE over the
    * MATERIALIZED per-interval table (the [[graft.ops.ModernSql]]
    * q_reach pattern: `localCheckpoint` first so Spark's UnionLoop
    * re-scans ≤[[KM_T]]+1 rows per iteration instead of re-running
    * the corpus aggregation). The oracle runs its own recursion in
    * DuckDB — two engines' recursive execution compared on the same
    * integer sequence.
    *
    * Scale: ONE user-keyed aggregation collapses the corpus to
    * (first_day, last_day) per user; everything after runs on the
    * ≤weeks-in-corpus interval histogram (calendar-bounded, NOT
    * data-bounded) — broadcast joins, no windows. The recursion depth
    * is ≤[[KM_T]]+1.
    */
  private val KM_GAP_DAYS = 14L
  private val KM_T = 12L

  /** Kaplan–Meier interval table (t, n_at_risk, d_events, c_censored)
    * from a per-user span frame (user_id, fd, ld) — factored out so
    * the LIVE span store ([[graft.streaming.StreamingHorizon]]) feeds
    * the identical derivation: stream the spans, read this table at
    * any horizon. Everything here runs on the user frame and the
    * ≤weeks interval histogram — broadcast joins, no windows.
    */
  private[graft] def kmIntervals(s: SparkSession, perUser: DataFrame)
      : DataFrame = {
    val horizon = perUser.agg(max(col("ld")).as("max_day"))
    val durs = perUser
      .crossJoin(broadcast(horizon))
      .select(
        expr(s"IF(ld <= max_day - $KM_GAP_DAYS, 1L, 0L)").as("churned"),
        expr(s"IF(ld <= max_day - $KM_GAP_DAYS," +
          " (ld - fd) div 7, (max_day - fd) div 7)").as("dur_w"))
    val hist = durs.groupBy(col("dur_w"))
      .agg(sum(col("churned")).as("d"),
        sum(lit(1L) - col("churned")).as("c"))
    val tot = durs.agg(count(lit(1)).as("n"))
    val grid = s.range(0, KM_T + 1).select(col("id").as("t"))
    val removedBefore = grid.alias("g")
      .join(broadcast(hist.alias("h")), col("h.dur_w") < col("g.t"), "left")
      .groupBy(col("g.t").as("t"))
      .agg(coalesce(sum(col("h.d") + col("h.c")), lit(0L)).as("gone"))
    removedBefore
      .join(broadcast(hist), col("dur_w") === col("t"), "left")
      .crossJoin(broadcast(tot))
      .select(col("t"), (col("n") - col("gone")).as("n_at_risk"),
        coalesce(col("d"), lit(0L)).as("d_events"),
        coalesce(col("c"), lit(0L)).as("c_censored"))
  }

  private def qKaplanMeier(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    // ONE corpus pass: the horizon (global max day) derives from the
    // per-user frame (max over users' last days ≡ max over events),
    // so the corpus is scanned once and the tiny user frame feeds
    // both consumers.
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("fd"), max(col("day")).as("ld"))
      .transform(graft.Memo.checkpoint)
    // The product-limit recurrence S_t = S_{t−1}·(n_t − d_t) div n_t
    // used to run as a RECURSIVE CTE; Spark's UnionLoop re-plans and
    // launches jobs PER ITERATION, which job-profiled as a 42-job,
    // driver-latency-bound plan (optimization round 13, guide §4:
    // prefer codegen'd expressions when the recursion is bounded).
    // The interval grid is calendar-bounded (t ≤ [[KM_T]] whatever
    // the corpus size), so the same floored recurrence —
    // bit-identical, floor division at every step — folds as
    // higher-order functions over the collected grid inside ONE
    // whole-stage-codegen'd job: the prefix length k replays the
    // CTE's termination (t contiguous from 0 while n_at_risk > 0; no
    // overflow — acc ≤ 10⁶ and n_at_risk ≤ user count keep the
    // product < 2⁶³ through ~10¹² users), and each row's s_ppm is the
    // fold of its first i+1 fractions (O(T²) = 169 integer ops). The
    // DuckDB oracle still runs its own TRUE recursion, so the hash
    // compare proves fold ≡ recursion on every corpus.
    kmIntervals(s, perUser)
      .agg(array_sort(collect_list(struct(col("t"), col("n_at_risk"),
        col("d_events"), col("c_censored")))).as("arr"))
      .withColumn("k", expr(
        "aggregate(sequence(0, size(arr) - 1), 0L, " +
          "(acc, i) -> IF(acc = i AND arr[i].n_at_risk > 0, acc + 1, acc))"))
      .select(expr(
        "inline(IF(k = 0, " +
          "CAST(array() AS ARRAY<STRUCT<week: BIGINT, n_at_risk: BIGINT, " +
          "n_churned: BIGINT, n_censored: BIGINT, s_ppm: BIGINT>>), " +
          "transform(sequence(0, CAST(k AS INT) - 1), i -> struct(" +
          "arr[i].t AS week, arr[i].n_at_risk AS n_at_risk, " +
          "arr[i].d_events AS n_churned, arr[i].c_censored AS n_censored, " +
          "aggregate(slice(arr, 1, i + 1), CAST(1000000 AS BIGINT), " +
          "(acc, x) -> (acc * (x.n_at_risk - x.d_events)) div x.n_at_risk" +
          ") AS s_ppm))))"))
  }

  private val qKaplanMeierSql: String =
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
       |h AS (SELECT max(day) AS max_day FROM ev),
       |durs AS (
       |  SELECT CASE WHEN ld <= max_day - $KM_GAP_DAYS
       |              THEN 1 ELSE 0 END AS churned,
       |    CASE WHEN ld <= max_day - $KM_GAP_DAYS
       |         THEN (ld - fd) // 7 ELSE (max_day - fd) // 7 END AS dur_w
       |  FROM (SELECT user_id, min(day) AS fd, max(day) AS ld
       |        FROM ev GROUP BY 1), h),
       |hist AS (
       |  SELECT dur_w, CAST(sum(churned) AS BIGINT) AS d,
       |    CAST(sum(1 - churned) AS BIGINT) AS c
       |  FROM durs GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM durs),
       |grid AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, ${KM_T + 1})),
       |iv AS (
       |  SELECT g.t,
       |    (SELECT n FROM tot)
       |      - coalesce((SELECT CAST(sum(h2.d + h2.c) AS BIGINT)
       |                  FROM hist h2 WHERE h2.dur_w < g.t), 0)
       |      AS n_at_risk,
       |    coalesce((SELECT d FROM hist h3 WHERE h3.dur_w = g.t), 0)
       |      AS d_events,
       |    coalesce((SELECT c FROM hist h4 WHERE h4.dur_w = g.t), 0)
       |      AS c_censored
       |  FROM grid g),
       |km(t, n_at_risk, d_events, c_censored, s_ppm) AS (
       |  SELECT t, n_at_risk, d_events, c_censored,
       |    (1000000 * (n_at_risk - d_events)) // n_at_risk
       |  FROM iv WHERE t = 0 AND n_at_risk > 0
       |  UNION ALL
       |  SELECT i.t, i.n_at_risk, i.d_events, i.c_censored,
       |    (k.s_ppm * (i.n_at_risk - i.d_events)) // i.n_at_risk
       |  FROM km k JOIN iv i ON i.t = k.t + 1
       |  WHERE i.n_at_risk > 0)
       |SELECT CAST(t AS BIGINT) AS week,
       |  CAST(n_at_risk AS BIGINT) AS n_at_risk,
       |  CAST(d_events AS BIGINT) AS n_churned,
       |  CAST(c_censored AS BIGINT) AS n_censored,
       |  CAST(s_ppm AS BIGINT) AS s_ppm
       |FROM km""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rfm" -> qRfm _,
    "q_kaplan_meier" -> qKaplanMeier _,
    "q_cross_corr" -> qCrossCorr _,
    "q_incr_join" -> qIncrJoin _,
    "q_tcloseness" -> qTcloseness _,
    "q_funnel_window" -> qFunnelWindow _,
    "q_gap_histogram" -> qGapHistogram _,
    "q_active_users" -> qActiveUsers _,
    "q_session_stats" -> qSessionStats _,
    "q_l28" -> qL28 _,
    "q_ltv_cohort" -> qLtvCohort _,
    "q_bootstrap" -> qBootstrap _,
    "q_fano" -> qFano _,
    "q_time_to_convert" -> qTimeToConvert _,
    "q_concurrency" -> qConcurrency _,
    "q_l_diversity" -> qLDiversity _,
    "q_benford" -> qBenford _,
    "q_ks" -> qKs _,
    "q_gini" -> qGini _,
    "q_theil_sen" -> qTheilSen _,
    "q_constraints" -> qConstraints _,
    "q_motif" -> qMotif _,
    "q_ts_pairs" -> qTsPairs _,
    "q_autocorr" -> qAutocorr _,
    "q_kanon" -> qKanon _,
    "q_ewma"      -> qEwma _,
    "q_transitions" -> qTransitions _,
    "q_drift"     -> qDrift _,
    "q_attribution" -> qAttribution _,
    "q_changepoint" -> qChangepoint _,
    "q_streaks"     -> qStreaks _,
    "q_paths"       -> qPaths _,
    "q_ab_test"     -> qAbTest _,
    "q_seasonality" -> qSeasonality _,
    "q_decile_lift" -> qDecileLift _,
    "q_p95_worst_days" -> qP95WorstDays _,
    "q_user_outliers" -> qUserOutliers _,
    "q_heavy_users" -> qHeavyUsers _,
    "q_forecast_naive" -> qForecastNaive _,
    "q_freshness"   -> qFreshness _,
    "q_log2_buckets" -> qLog2Buckets _,
    "q_source_overlap" -> qSourceOverlap _,
    "q_rolling_median" -> qRollingMedian _,
    "q_winsorize" -> qWinsorize _,
    "q_profile"   -> qProfile _,
    "q_mad"       -> qMad _,
    "q_basket"    -> qBasket _,
    "q_histogram" -> qHistogram _,
    "q_incr_agg"  -> qIncrAgg _,
    "q_skew_join" -> qSkewJoin _,
    "q_funnel"    -> qFunnel _,
    "q_cohort"    -> qCohort _,
    "q_anomaly"   -> qAnomaly _
  )

  val oracles: Map[String, String] = Map(
    "q_rfm" -> qRfmSql,
    "q_kaplan_meier" -> qKaplanMeierSql,
    "q_cross_corr" -> qCrossCorrSql,
    "q_incr_join" -> qIncrJoinSql,
    "q_tcloseness" -> qTclosenessSql,
    "q_funnel_window" -> qFunnelWindowSql,
    "q_gap_histogram" -> qGapHistogramSql,
    "q_active_users" -> qActiveUsersSql,
    "q_session_stats" -> qSessionStatsSql,
    "q_l28" -> qL28Sql,
    "q_ltv_cohort" -> qLtvCohortSql,
    "q_bootstrap" -> qBootstrapSql,
    "q_fano" -> qFanoSql,
    "q_time_to_convert" -> qTimeToConvertSql,
    "q_concurrency" -> qConcurrencySql,
    "q_l_diversity" -> qLDiversitySql,
    "q_benford" -> qBenfordSql,
    "q_ks" -> qKsSql,
    "q_gini" -> qGiniSql,
    "q_theil_sen" -> qTheilSenSql,
    "q_constraints" -> qConstraintsSql,
    "q_motif" -> qMotifSql,
    "q_ts_pairs" -> qTsPairsSql,
    "q_autocorr" -> qAutocorrSql,
    "q_kanon" -> qKanonSql,
    "q_ewma"      -> qEwmaSql,
    "q_transitions" -> qTransitionsSql,
    "q_drift"     -> qDriftSql,
    "q_attribution" -> qAttributionSql,
    "q_changepoint" -> qChangepointSql,
    "q_streaks"     -> qStreaksSql,
    "q_paths"       -> qPathsSql,
    "q_ab_test"     -> qAbTestSql,
    "q_seasonality" -> qSeasonalitySql,
    "q_decile_lift" -> qDecileLiftSql,
    "q_p95_worst_days" -> qP95WorstDaysSql,
    "q_user_outliers" -> qUserOutliersSql,
    "q_heavy_users" -> qHeavyUsersSql,
    "q_forecast_naive" -> qForecastNaiveSql,
    "q_freshness"   -> qFreshnessSql,
    "q_log2_buckets" -> qLog2BucketsSql,
    "q_source_overlap" -> qSourceOverlapSql,
    "q_rolling_median" -> qRollingMedianSql,
    "q_winsorize" -> qWinsorizeSql,
    "q_profile"   -> qProfileSql,
    "q_mad"       -> qMadSql,
    "q_basket"    -> qBasketSql,
    "q_histogram" -> qHistogramSql,
    "q_incr_agg"  -> qIncrAggSql,
    "q_skew_join" -> qSkewJoinSql,
    "q_funnel"    -> qFunnelSql,
    "q_cohort"    -> qCohortSql,
    "q_anomaly"   -> qAnomalySql
  )
}
