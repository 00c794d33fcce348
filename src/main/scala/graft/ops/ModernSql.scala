package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark 4 SQL-layer surface: the VARIANT semi-structured type and
  * recursive CTEs — both run through `spark.sql` over the registered
  * views, exercising the engine's parser/analyzer path end to end.
  *
  * Reference provenance: the reference hand-parses its JSON envelopes
  * with Jackson (`DebeziumTransactionReconstructor.java:103-122`) and
  * has no recursion anywhere; these are the engine-native upgrades of
  * both ideas (SURVEY.md §1.3, §2.3).
  */
object ModernSql {

  // -------------------------------------------------------------- q_variant
  /** VARIANT ingestion of the event props: `parse_json` once into
    * Spark's binary semi-structured encoding, typed `variant_get`
    * extraction, then a per-type rollup. Contrast with `q_json`
    * (string navigation): VARIANT parses each row once and each
    * access reads the typed encoding, where `get_json_object`
    * re-parses the string per access — at 100 TB with several
    * accessed paths, that is the difference between one parse and k
    * parses per row. The oracle navigates the same JSON with DuckDB's
    * native JSON type.
    */
  private def qVariant(s: SparkSession, d: String): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      """SELECT event_type,
        |  count(*) AS n,
        |  sum(variant_get(parse_json(props), '$.k', 'bigint')) AS sum_k,
        |  min(variant_get(parse_json(props), '$.k', 'bigint')) AS min_k,
        |  max(variant_get(parse_json(props), '$.k', 'bigint')) AS max_k
        |FROM events
        |GROUP BY 1""".stripMargin)
  }

  private val qVariantSql: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS sum_k,
      |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS min_k,
      |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS max_k
      |FROM events
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q_reach
  /** Min-hop reachability from supplier 0 over the top-co-supply-edge
    * graph via a RECURSIVE CTE — the SAME SQL text runs verbatim on
    * Spark (4.x recursive CTE support) and DuckDB, so the oracle
    * compares two engines' recursion, not two formulations. Depth
    * capped at 3 (the UNION ALL recursion enumerates paths; the cap
    * bounds it on cyclic graphs, and the final min-hop aggregation
    * collapses paths to distances).
    *
    * Scale: each recursive step is one join of the frontier against
    * the edge list — the same per-round shape as the iterative
    * `canonicalFixpoint`/`q_pagerank` loops, with the loop driven by
    * the engine instead of the driver. For unbounded-depth closures
    * at 100 TB prefer the driver loop (checkpoint cadence control);
    * the CTE form is the SQL-surface equivalent for bounded depth.
    *
    * Measured cost caveat (sf0.1 warm): Spark's UnionLoop re-evaluates
    * the NON-recursive CTE chain (the co→pw→edges top-500 build)
    * inside every iteration — ~10 s ≈ 4× the one-shot edge build,
    * while the driver-loop graph queries sharing the memoized edge
    * frame run the same build once (`q_triangles` 0.5 s warm). The
    * identical-SQL-text design is the point of this query; when the
    * text constraint is dropped, materialize the edge list first and
    * recurse over it (the `ops/Graph` pattern).
    */
  private val reachSql: String =
    s"""WITH RECURSIVE co AS (
       |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |pw AS (
       |  SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM co a JOIN co b ON a.l_orderkey = b.l_orderkey
       |                     AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT sa, sb FROM (
       |    SELECT sa, sb, row_number() OVER (ORDER BY w DESC, sa, sb) AS rk
       |    FROM pw)
       |  WHERE rk <= 500),
       |dir AS (
       |  SELECT sa AS u, sb AS v FROM edges
       |  UNION ALL SELECT sb AS u, sa AS v FROM edges),
       |paths(v, hops) AS (
       |  SELECT CAST(0 AS BIGINT) AS v, 0 AS hops
       |  UNION ALL
       |  SELECT d.v, p.hops + 1
       |  FROM paths p JOIN dir d ON d.u = p.v
       |  WHERE p.hops < 3)
       |SELECT v AS supplier, CAST(min(hops) AS INTEGER) AS hops
       |FROM paths GROUP BY 1""".stripMargin

  private def qReach(s: SparkSession, d: String): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(reachSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_variant" -> qVariant _,
    "q_reach"   -> qReach _
  )

  val oracles: Map[String, String] = Map(
    "q_variant" -> qVariantSql,
    "q_reach"   -> reachSql
  )
}
