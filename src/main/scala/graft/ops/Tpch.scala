package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** TPC-H-shaped whole queries (Q3 / Q5 / Q10, adapted to the
  * driver-generated schema and 1995–2001 date domain) — end-to-end
  * anchors that exercise multi-join + aggregate + top-k composition
  * exactly as the standard benchmark phrases them. Revenue sums route
  * through exact decimals (`graft.Det`) so results hash-match the
  * oracle bit-for-bit.
  *
  * Reference provenance: the reference has no relational surface
  * (`/root/reference/readme.md:1-5`); these anchor SURVEY.md §2.3's
  * join/agg/top-k rows against a workload shape every reviewer knows.
  *
  * Scale notes shared by all three: dimension tables (customer,
  * supplier, nation, region) are small relative to the facts —
  * nation/region are broadcast outright; customer⋈orders and
  * orders⋈lineitem are key-partitioned shuffles Catalyst plans as
  * hash joins with AQE free to pick broadcast when a filtered side
  * shrinks below the threshold. Every filter sits on the scan
  * (PushedFilters), every top-k is TakeOrderedAndProject.
  */
object Tpch {

  private def revenue = Det.dsumExact(
    Det.money2(col("l_extendedprice")) * Det.factor2(lit(1) - col("l_discount")))

  private val revenueSql =
    """CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |         * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)""".stripMargin

  // --------------------------------------------------------------- q_tpch3
  /** Q3 (shipping priority): top-10 unshipped BUILDING-segment orders
    * by revenue as of the cutoff. (`o_orderpriority` stands in for
    * the schema's absent `o_shippriority`.)
    */
  private val Q3_CUT = "1996-06-30"

  private def qTpch3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < lit(Q3_CUT)),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > lit(Q3_CUT)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  private val qTpch3Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  $revenueSql AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '$Q3_CUT'
       |  AND l_shipdate > TIMESTAMP '$Q3_CUT'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  // --------------------------------------------------------------- q_tpch5
  /** Q5 (local supplier volume): revenue per ASIA nation from orders
    * placed in 1996 where the supplier and customer share the nation.
    */
  private def qTpch5(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenue.as("revenue"))

  private val qTpch5Sql: String =
    s"""SELECT n_name, $revenueSql AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY 1""".stripMargin

  // -------------------------------------------------------------- q_tpch10
  /** Q10 (returned items): top-20 customers by revenue lost to
    * returns in 1996-Q1 orders.
    */
  private def qTpch10(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1996-04-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(revenue.as("revenue"),
        count(lit(1)).cast(IntegerType).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val qTpch10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  $revenueSql AS revenue,
       |  CAST(count(*) AS INTEGER) AS n_items
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-04-01'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  // -------------------------------------------------------------- q_tpch18
  /** Q18 (large-volume customers): orders whose total line quantity
    * exceeds the threshold, with their customer — the join-OVER-
    * aggregate shape (semi-join against an aggregated subquery) the
    * other anchors don't exercise.
    *
    * Scale: the heavy agg groups lineitem by orderkey (one exchange);
    * the HAVING filter shrinks it to a handful of hot orders, which
    * AQE then broadcasts into the orders⋈customer side. The decimal
    * quantity sum keeps the threshold comparison exact.
    */
  private val Q18_QTY = 200

  private def qTpch18(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(Det.dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > Q18_QTY)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val qTpch18Sql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, ${Det.dsumSql("l_quantity")} AS total_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING ${Det.dsumSql("l_quantity")} > $Q18_QTY)
       |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       |  total_qty
       |FROM orders
       |JOIN big ON o_orderkey = l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch3"  -> qTpch3 _,
    "q_tpch5"  -> qTpch5 _,
    "q_tpch10" -> qTpch10 _,
    "q_tpch18" -> qTpch18 _
  )

  val oracles: Map[String, String] = Map(
    "q_tpch3"  -> qTpch3Sql,
    "q_tpch5"  -> qTpch5Sql,
    "q_tpch10" -> qTpch10Sql,
    "q_tpch18" -> qTpch18Sql
  )
}
