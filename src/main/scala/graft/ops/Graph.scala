package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over a co-occurrence graph derived from the
  * relational tables — the supplier co-supply network (suppliers
  * linked when they serve the same order). Complements the dedup
  * family's connected-components loop (`Dedup.canonicalFixpoint`)
  * with the other classic distributed-graph primitive: triangle
  * counting.
  *
  * Reference provenance: no graph surface in the reference
  * (`/root/reference/readme.md:1-5`); extends SURVEY.md §2.3.
  */
object Graph {

  // ------------------------------------------------------------ q_triangles
  /** Per-vertex triangle counts on the top-[[EDGE_TOP]] strongest
    * co-supply edges, via the degree-ordered (compact-forward)
    * algorithm:
    *  1. edge weights = co-occurring order count per supplier pair
    *     (one distinct + one self-join within order, one agg);
    *  2. keep the [[EDGE_TOP]] heaviest edges (deterministic
    *     tie-break) — `orderBy().limit()` plans as
    *     TakeOrderedAndProject, per-partition heaps, no global sort;
    *  3. orient every edge from its lower to its higher endpoint in
    *     the total order (degree, id) — the orientation that bounds
    *     every vertex's out-degree by O(√m) on any graph, so the
    *     wedge join below cannot blow up on hubs (the textbook
    *     skew-proof triangle algorithm);
    *  4. wedges = oriented ⋈ oriented on the source vertex (ordered
    *     far endpoints); triangles = wedges semi-joined against the
    *     closing oriented edge. Each triangle is produced exactly
    *     once.
    *
    * Scale: degree table is vertex-sized → '''broadcast'''; the wedge
    * and closing joins shuffle only (vertex, vertex) pairs. With the
    * orientation, total wedge count is O(m^{3/2}) worst-case —
    * independent of the degree skew that makes the naive
    * (unoriented) join quadratic on hub vertices.
    */
  private val EDGE_TOP = 500

  private def qTriangles(s: SparkSession, d: String): DataFrame = {
    val co = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val pw = co.alias("a")
      .join(co.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .groupBy(col("a.l_suppkey").as("sa"), col("b.l_suppkey").as("sb"))
      .agg(count(lit(1)).as("w"))
    val edges = pw
      .orderBy(col("w").desc, col("sa"), col("sb"))
      .limit(EDGE_TOP)
      .select(col("sa"), col("sb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.select(col("sa").as("v"))
      .unionAll(edges.select(col("sb").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val keyed = edges
      .join(broadcast(deg.select(col("v").as("sa"), col("d").as("da"))),
        Seq("sa"))
      .join(broadcast(deg.select(col("v").as("sb"), col("d").as("db"))),
        Seq("sb"))
    val aFirst = struct(col("da"), col("sa")) < struct(col("db"), col("sb"))
    val o = keyed.select(
      when(aFirst, col("sa")).otherwise(col("sb")).as("u"),
      when(aFirst, col("sb")).otherwise(col("sa")).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ou = o.join(broadcast(deg.select(col("v"), col("d").as("dv"))),
      Seq("v"))
    val tri = ou.alias("a")
      .join(ou.alias("b"),
        col("a.u") === col("b.u") &&
          (struct(col("a.dv"), col("a.v")) <
            struct(col("b.dv"), col("b.v"))))
      .join(o.alias("c"),
        col("c.u") === col("a.v") && col("c.v") === col("b.v"),
        "left_semi")
      .select(col("a.u").as("x"), col("a.v").as("y"), col("b.v").as("z"))
    tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("supplier"))
      .groupBy(col("supplier"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  private val qTrianglesSql: String =
    s"""WITH co AS (
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
       |  WHERE rk <= $EDGE_TOP),
       |deg AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
       |    SELECT sa AS v FROM edges UNION ALL SELECT sb AS v FROM edges)
       |  GROUP BY 1),
       |o AS (
       |  SELECT CASE WHEN (da.d, e.sa) < (db.d, e.sb)
       |              THEN e.sa ELSE e.sb END AS u,
       |         CASE WHEN (da.d, e.sa) < (db.d, e.sb)
       |              THEN e.sb ELSE e.sa END AS v
       |  FROM edges e
       |  JOIN deg da ON da.v = e.sa
       |  JOIN deg db ON db.v = e.sb),
       |ou AS (SELECT o.u, o.v, d.d AS dv FROM o JOIN deg d ON d.v = o.v),
       |tri AS (
       |  SELECT a.u AS x, a.v AS y, b.v AS z
       |  FROM ou a
       |  JOIN ou b ON a.u = b.u AND ((a.dv, a.v) < (b.dv, b.v))
       |  WHERE EXISTS (SELECT 1 FROM o c WHERE c.u = a.v AND c.v = b.v))
       |SELECT v AS supplier, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM (
       |  SELECT x AS v FROM tri
       |  UNION ALL SELECT y AS v FROM tri
       |  UNION ALL SELECT z AS v FROM tri)
       |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_triangles" -> qTriangles _
  )

  val oracles: Map[String, String] = Map(
    "q_triangles" -> qTrianglesSql
  )
}
