package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout AUDIT queries — the measurement side of
  * [[graft.sources.Layout]]'s write operators. `writeClustered` /
  * `writeZOrdered` decide how a 100 TB table lands on disk; these
  * queries QUANTIFY what a given layout buys before anyone pays for a
  * rewrite: per candidate clustering key, the expected fraction of
  * files a point probe must read under the current layout vs a
  * clustered one (parquet min/max skipping is exactly "skip every
  * file whose [min,max] excludes the predicate value"). This is the
  * sizing study a lakehouse OPTIMIZE/CLUSTER BY decision runs on a
  * sample before touching petabytes.
  *
  * Both queries are integer-exact end to end (file ids, min/max,
  * cover counts, ppm ratios — no floats), so the DuckDB oracle
  * compares bit-identically.
  *
  * Reference provenance: no layout surface in the reference
  * (`/root/reference/readme.md:1-5`); extends SURVEY.md §2.3 on the
  * warehouse-maintenance axis, beside [[Operational]]'s q_freshness /
  * q_incr_agg.
  */
object LayoutAudit {

  /** Simulated file count — the granularity min/max skipping works
    * at. 32 here; at 100 TB the same audit runs with the real file
    * count (the frames below stay file-count-sized, so any F works).
    */
  private val F = 32L

  // --------------------------------------------------------- q_cluster_depth
  /** Min/max pruning effectiveness per candidate clustering key.
    *
    * Layouts simulated per candidate column c:
    *  - '''ingest''': file = equi-width bucket of l_orderkey — the
    *    arrival-order proxy (files fill as orders arrive, so each
    *    file covers a contiguous orderkey span and an arbitrary
    *    slice of every other column);
    *  - '''range''': file = equi-width bucket of c over its [lo, hi]
    *    span — what [[graft.sources.Layout.writeClustered]] produces
    *    WITHOUT paying the global sort a rank-based split would cost
    *    (lo/hi come from one broadcast scalar aggregate).
    *
    * Metric: over the DISTINCT values v of c, the mean (in ppm) of
    * `files whose [min,max] covers v / F` — the expected fraction of
    * files an equality probe reads. 1/F is perfect clustering; 1.0
    * means min/max statistics prune nothing. l_orderkey itself rides
    * along as a control: its ingest layout IS clustered (ingest ≡
    * its own range bucketing), so the audit must report ≈1/F there
    * while the uncorrelated keys sit near 1.0 — measured at sf0.01:
    * 31250 ppm (exactly 1/32) vs 999296/1000000 for part/supp.
    *
    * Scale: one pass computes per-(file, candidate) min/max (a
    * [[F]]-row frame per layout) — '''broadcast'''; the cover join is
    * distinct-values × F map-side work, then one aggregation. Nothing
    * but the scan grows with row count.
    */
  private val cands = Seq("l_orderkey", "l_suppkey", "l_partkey")

  /** Fused audit core shared by both queries (optimization round 13).
    *
    * The round-13 build already shared the min/max and distinct
    * frames across probes; this round fuses the remaining per-layout
    * and per-dim passes into one each — job-profiled at sf0.1 the two
    * queries were 42- and 38-job plans of <100 ms jobs (pure pass
    * count, guide §2.4), and each extra pass is an extra corpus scan
    * at every scale:
    *
    *  - ONE exploded pass computes every layout's per-file [min,max]
    *    of every probe dim (`explode` of (layout, file) tags; the
    *    keyed agg is map-side combinable to ≤ layouts·F rows per
    *    partition — same total rows decoded as the per-layout passes,
    *    minus the repeated scans);
    *  - ONE pass computes every dim's distinct values ((dim, v)
    *    pairs, one exchange carrying what the per-dim passes moved in
    *    k exchanges);
    *  - ONE broadcast join + keyed count computes every probe's
    *    cover (the join's per-(dim, layout) cardinality — the keyless
    *    count of the sf100 rewrite, now grouped by the ≤6 probe keys:
    *    still zero corpus-scale shuffle rows, map-side combined);
    *  - a 6-row literal SPINE left-joins the covers so the empty
    *    corpus still yields one row per probe (n_distinct 0, ppm
    *    NULL) exactly as the per-probe scalar aggregates did.
    *
    * `probes` = (dim, layoutTag, layoutLabel); `fileCols` assigns each
    * layoutTag its file expression over `rows`.
    */
  private def fusedCover(s: SparkSession, rows: DataFrame,
      dims: Seq[String], fileCols: Seq[(String, Column)],
      probes: Seq[(String, String, String)]): DataFrame = {
    val mmAggs = dims.flatMap(c =>
      Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c")))
    val fm = rows
      .select(explode(array(fileCols.map { case (tag, f) =>
        struct(lit(tag).as("lay"), f.cast("long").as("f"))
      }: _*)).as("lf") +: dims.map(col): _*)
      .groupBy(col("lf.lay").as("lay"), col("lf.f").as("f"))
      .agg(mmAggs.head, mmAggs.tail: _*)
      .transform(graft.Memo.checkpoint) // ≤ layouts·F rows
    // Long form (lay, dim, lo, hi), restricted to the probed pairs.
    val stackExpr = s"stack(${dims.size}, " + dims.map(c =>
      s"'$c', lo_$c, hi_$c").mkString(", ") + ") AS (c, lo, hi)"
    val probeSet = probes.map { case (dim, tag, _) => s"$tag|$dim" }.toSet
    val fmLong = fm.select(col("lay"), expr(stackExpr))
      .filter(concat_ws("|", col("lay"), col("c"))
        .isInCollection(probeSet))
    val dv = rows
      .select(explode(array(dims.map(c =>
        struct(lit(c).as("c"), col(c).as("v"))): _*)).as("cv"))
      .select(col("cv.c").as("c"), col("cv.v").as("v"))
      .distinct()
      .transform(graft.Memo.checkpoint)
    val cover = dv.join(broadcast(fmLong),
        dv("c") === fmLong("c") &&
          col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy(dv("c").as("c"), col("lay"))
      .agg(count(lit(1)).as("cover"))
    val nd = dv.groupBy(col("c")).agg(count(lit(1)).as("n_distinct"))
    import s.implicits._
    val spine = probes.toDF("c", "lay", "layout")
    spine
      .join(broadcast(nd), Seq("c"), "left_outer")
      .join(broadcast(cover), Seq("c", "lay"), "left_outer")
      .select(col("c").as("col_name"), col("layout"),
        lit(F).as("n_files"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("cover"))
      // Same ppm text as the per-probe aggregates produced — the
      // empty-corpus guard (0 div 0 throws under ANSI) included.
      .withColumn("avg_cover_ppm",
        expr(s"CASE WHEN n_distinct = 0 THEN NULL ELSE " +
          s"CAST(cover AS DECIMAL(38,0)) * 1000000" +
          s" div (CAST(n_distinct AS DECIMAL(38,0)) * $F) END"))
      .drop("cover")
  }

  private def qClusterDepth(s: SparkSession, d: String): DataFrame = {
    // No checkpoint on the raw 3-column projection (round 13, the
    // q_zorder ws lesson one decade up): it feeds span + the fused
    // fm + dv passes, every one a cheap pushed-down columnar scan —
    // while a 600 M-row deserialized block pin at sf100 (~30 GB)
    // OOM'd a 90 GB heap before anything else ran. The 1-row SPAN is
    // what multiple consumers must not recompute (the fm pass embeds
    // it as a broadcast): checkpoint that.
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"))
    val span = li.agg(
      min(col("l_orderkey")).as("lo_o"), max(col("l_orderkey")).as("hi_o"),
      min(col("l_suppkey")).as("lo_s"), max(col("l_suppkey")).as("hi_s"),
      min(col("l_partkey")).as("lo_p"), max(col("l_partkey")).as("hi_p"))
      .transform(graft.Memo.checkpoint) // 1 row, embedded by the fm pass
    val withSpan = li.crossJoin(broadcast(span))
    def rangeFile(c: String, lo: String, hi: String): Column =
      expr(s"least(($c - $lo) * $F div ($hi - $lo + 1), ${F - 1})")
    // The ingest layout's file column is l_orderkey's range bucketing,
    // so l_orderkey's "range" probe reads the SAME (layout, dim) cover
    // as its "ingest" probe — one tag serves both output rows; each
    // other candidate's range layout buckets on itself.
    val fileCols = Seq(
      "ingest" -> rangeFile("l_orderkey", "lo_o", "hi_o"),
      "r_s" -> rangeFile("l_suppkey", "lo_s", "hi_s"),
      "r_p" -> rangeFile("l_partkey", "lo_p", "hi_p"))
    val probes = Seq(
      ("l_orderkey", "ingest", "ingest"), ("l_orderkey", "ingest", "range"),
      ("l_suppkey", "ingest", "ingest"), ("l_suppkey", "r_s", "range"),
      ("l_partkey", "ingest", "ingest"), ("l_partkey", "r_p", "range"))
    fusedCover(s, withSpan, cands, fileCols, probes)
  }

  private val qClusterDepthSql: String = {
    def one(c: String, layout: String, fileExpr: String): String =
      s"""SELECT '$c' AS col_name, '$layout' AS layout,
         |  CAST($F AS BIGINT) AS n_files,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(CAST(sum(nf) AS HUGEINT) * 1000000
         |    // (CAST(count(*) AS HUGEINT) * $F) AS BIGINT)
         |    AS avg_cover_ppm
         |FROM (
         |  SELECT dv.v, CAST(count(*) AS BIGINT) AS nf
         |  FROM (SELECT DISTINCT $c AS v FROM li) dv
         |  JOIN (
         |    SELECT $fileExpr AS f, min($c) AS lo, max($c) AS hi
         |    FROM li GROUP BY 1) fm
         |    ON dv.v >= fm.lo AND dv.v <= fm.hi
         |  GROUP BY 1)""".stripMargin
    val rf = Map(
      "l_orderkey" -> s"least((l_orderkey - (SELECT min(l_orderkey) FROM li)) * $F // ((SELECT max(l_orderkey) - min(l_orderkey) FROM li) + 1), ${F - 1})",
      "l_suppkey" -> s"least((l_suppkey - (SELECT min(l_suppkey) FROM li)) * $F // ((SELECT max(l_suppkey) - min(l_suppkey) FROM li) + 1), ${F - 1})",
      "l_partkey" -> s"least((l_partkey - (SELECT min(l_partkey) FROM li)) * $F // ((SELECT max(l_partkey) - min(l_partkey) FROM li) + 1), ${F - 1})")
    val blocks = Seq("l_orderkey", "l_suppkey", "l_partkey").flatMap { c =>
      Seq(one(c, "ingest", rf("l_orderkey")), one(c, "range", rf(c)))
    }
    s"""WITH li AS (
       |  SELECT l_orderkey, l_suppkey, l_partkey FROM lineitem)
       |${blocks.mkString("\nUNION ALL\n")}""".stripMargin
  }

  // --------------------------------------------------------------- q_zorder
  /** Two-dimensional clustering audit — does a Morton (Z-order) curve
    * on (l_suppkey, l_partkey) keep point probes on BOTH dimensions
    * prunable, where single-key range clustering serves only its own
    * key? The decision query behind
    * [[graft.sources.Layout.writeZOrdered]]: run it on a sample,
    * compare the three layouts, then pay for the rewrite the numbers
    * justify.
    *
    * Layouts (all [[F]] files): `range_supp` / `range_part` —
    * equi-width on one key; `zorder` — each key min/max-scaled to a
    * 5-bit grid coordinate, bits interleaved (supp even, part odd
    * positions), file = z div [[F]] (the z-value is 10 bits → exactly
    * F contiguous curve segments). The interleave is unrolled integer
    * arithmetic — identical text in both engines, no bit intrinsics
    * to disagree on.
    *
    * Metric: [[qClusterDepth]]'s avg_cover_ppm, probed per dimension
    * → 3 layouts × 2 probe dimensions. Expected shape: range_supp ≈
    * 1/F on supp but ≈1 on part (and vice versa); zorder lands near
    * √(1/F) on BOTH — the curve's guarantee.
    *
    * Scale: identical to [[qClusterDepth]] — per-file min/max frames
    * broadcast, distinct-value cover joins map-side, one agg each.
    */
  private def morton5(gs: String, gp: String): String =
    (0 until 5).map { i =>
      s"(($gs div ${1 << i}) % 2) * ${1L << (2 * i)}" +
        s" + (($gp div ${1 << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  private def qZorder(s: SparkSession, d: String): DataFrame = {
    // No checkpoint on the raw 2-column projection (round 13): it fed
    // only the span aggregate and the ws build — two cheap columnar
    // scans — while pinning 60M rows of block memory at sf10 next to
    // ws's own checkpoint (the eviction pressure the r12 profile
    // measured at 15-33s isolated variance).
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_partkey"))
    val span = li.agg(
      min(col("l_suppkey")).as("lo_s"), max(col("l_suppkey")).as("hi_s"),
      min(col("l_partkey")).as("lo_p"), max(col("l_partkey")).as("hi_p"))
      .transform(graft.Memo.checkpoint) // 1 row, embedded by 5 ws passes
    // gs/gp are build-time intermediates only — dropped before the
    // checkpoint so the pinned frame is 5 columns, not 7.
    val ws = li.crossJoin(broadcast(span))
      .withColumn("gs",
        expr(s"least((l_suppkey - lo_s) * 32 div (hi_s - lo_s + 1), 31)"))
      .withColumn("gp",
        expr(s"least((l_partkey - lo_p) * 32 div (hi_p - lo_p + 1), 31)"))
      .withColumn("fz", expr(s"(${morton5("gs", "gp")}) div $F"))
      .withColumn("fs", expr(s"least((l_suppkey - lo_s) * $F" +
        s" div (hi_s - lo_s + 1), ${F - 1})"))
      .withColumn("fp", expr(s"least((l_partkey - lo_p) * $F" +
        s" div (hi_p - lo_p + 1), ${F - 1})"))
      .select(col("l_suppkey"), col("l_partkey"),
        col("fs"), col("fp"), col("fz"))
    // ws itself is NOT checkpointed (round 13): its consumers (the
    // fused fm + dv passes) each re-derive it as a pushed-down
    // 2-column scan plus broadcast-span arithmetic — cheap at every
    // scale — where the checkpointed 5-column frame pinned 60 M rows
    // at sf10 (the r12 isolated-variance autopsy) and ~30 GB at
    // sf100.
    val dims = Seq("l_suppkey", "l_partkey")
    val fileCols = Seq(
      "range_supp" -> col("fs"), "range_part" -> col("fp"),
      "zorder" -> col("fz"))
    // Every layout × every dim is probed (the 2-D audit's point).
    val probes = for {
      (tag, _) <- fileCols; dim <- dims
    } yield (dim, tag, tag)
    fusedCover(s, ws, dims, fileCols, probes)
      .select(col("layout"), col("col_name").as("probe_dim"),
        col("n_distinct"), col("avg_cover_ppm"))
  }

  private val qZorderSql: String = {
    def one(layout: String, fileCol: String, dim: String): String =
      s"""SELECT '$layout' AS layout, '$dim' AS probe_dim,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(CAST(sum(nf) AS HUGEINT) * 1000000
         |    // (CAST(count(*) AS HUGEINT) * $F) AS BIGINT)
         |    AS avg_cover_ppm
         |FROM (
         |  SELECT dv.v, CAST(count(*) AS BIGINT) AS nf
         |  FROM (SELECT DISTINCT $dim AS v FROM ws) dv
         |  JOIN (
         |    SELECT $fileCol AS f, min($dim) AS lo, max($dim) AS hi
         |    FROM ws GROUP BY 1) fm
         |    ON dv.v >= fm.lo AND dv.v <= fm.hi
         |  GROUP BY 1)""".stripMargin
    val mz = morton5("gs", "gp").replace("div", "//")
    s"""WITH span AS (
       |  SELECT min(l_suppkey) AS lo_s, max(l_suppkey) AS hi_s,
       |    min(l_partkey) AS lo_p, max(l_partkey) AS hi_p
       |  FROM lineitem),
       |g AS (
       |  SELECT l_suppkey, l_partkey,
       |    least((l_suppkey - lo_s) * 32 // (hi_s - lo_s + 1), 31) AS gs,
       |    least((l_partkey - lo_p) * 32 // (hi_p - lo_p + 1), 31) AS gp,
       |    least((l_suppkey - lo_s) * $F // (hi_s - lo_s + 1), ${F - 1})
       |      AS fs,
       |    least((l_partkey - lo_p) * $F // (hi_p - lo_p + 1), ${F - 1})
       |      AS fp
       |  FROM lineitem, span),
       |ws AS (
       |  SELECT l_suppkey, l_partkey, fs, fp, ($mz) // $F AS fz FROM g)
       |${Seq(
           one("range_supp", "fs", "l_suppkey"),
           one("range_supp", "fs", "l_partkey"),
           one("range_part", "fp", "l_suppkey"),
           one("range_part", "fp", "l_partkey"),
           one("zorder", "fz", "l_suppkey"),
           one("zorder", "fz", "l_partkey")).mkString("\nUNION ALL\n")}"""
      .stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_depth" -> qClusterDepth _,
    "q_zorder" -> qZorder _
  )

  val oracles: Map[String, String] = Map(
    "q_cluster_depth" -> qClusterDepthSql,
    "q_zorder" -> qZorderSql
  )
}
