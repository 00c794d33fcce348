package graft.llm

import graft.Tables
import graft.functions.PolyHash.poly_hash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators: KMV (k-minimum-values) cardinality and
  * overlap estimation, and a count-min frequency sketch — the
  * sub-linear replacements for `count_distinct` / exact set
  * intersection / exact heavy-hitter counting that a 100 TB corpus
  * requires. Exact answers are computed alongside at bench scale so
  * each query doubles as its own calibration report (the operating
  * data a rollout needs before trusting a sketch at 1000×), the same
  * framing as `q_minhash_est` ([[Dedup]]).
  *
  * All sketches are built on [[graft.functions.PolyHash]] — the
  * repo's deterministic cross-engine hash — so the DuckDB oracle
  * reproduces every estimate bit-for-bit; no RNG, no engine-native
  * murmur.
  *
  * Reference provenance: the reference engine has no sketch surface
  * (`/root/reference/readme.md:1-5`); these extend the LLM-pipeline
  * set SURVEY.md §2.3 mandates (corpus statistics at scale).
  */
object Sketches {

  private val P = 1000000007L

  /** Affine post-mix for sketch hashes: near-identical strings (shared
    * prefix, sequential suffix — exactly what a real corpus's URLs,
    * titles and boilerplate look like) leave `poly_hash` values in a
    * few TIGHT CLUSTERS (the suffix contributes only small deltas),
    * which destroys the uniform-order-statistics assumption KMV and
    * count-min live on (measured: KMV over 900 unmixed sequential
    * texts estimated 245). Multiplying by a large odd constant mod P
    * scales intra-cluster deltas across the whole hash space
    * (δ → A·δ mod P), restoring uniformity; the map is bijective mod
    * P, so distinctness is exactly preserved. MinHash/LSH band keys
    * ([[Dedup]]) don't need this — they compare hashes for EQUALITY,
    * not by ORDER.
    */
  private[graft] val MIX_A = 747796405L
  private[graft] val MIX_B = 2654435769L

  /** Shared with [[graft.streaming.StreamingKmv]] so the online sketch
    * stays merge-parity-exact with the batch one by construction.
    */
  private[graft] def mixed(h: Column): Column = (h * MIX_A + MIX_B) % P

  /** Scala reference of [[mixed]]∘poly_hash (spec-side recomputes). */
  private[graft] def mixedHash(s: String): Long =
    (graft.functions.PolyHash.hash(s) * MIX_A + MIX_B) % P

  /** DuckDB twin of `mixed(poly_hash(x))` (hash via [[Dedup.tokHashSql]]). */
  private def phSql(t: String): String =
    s"""((list_reduce(list_prepend(CAST(7 AS BIGINT),
       |      list_transform(string_split_regex($t, ''),
       |                     c -> CAST(ascii(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 1000000007)
       |   * $MIX_A + $MIX_B) % 1000000007)""".stripMargin

  // -------------------------------------------------------- q_kmv_distinct
  /** KMV distinct-count estimate of distinct document texts: keep the
    * K smallest distinct hash values; if the K-th smallest is h_K,
    * the K minima occupy a fraction h_K/P of the hash space, so
    * n_distinct ≈ (K-1)·P/h_K. Reported next to the exact distinct
    * count and the estimation error in ppm.
    *
    * Scale: the sketch is an `orderBy().limit(K)` over DISTINCT
    * hashes → TakeOrderedAndProject: every partition keeps its local
    * K minima and only K·n_partitions 8-byte values ever move — the
    * mergeability that makes KMV the cardinality path at 100 TB,
    * where the exact `count_distinct` twin (here only calibration)
    * would shuffle every distinct value. No full sort, no global
    * window.
    */
  private val KMV_K = 256

  private def qKmvDistinct(s: SparkSession, d: String): DataFrame = {
    val h = Tables.documents(s, d)
      .select(mixed(poly_hash(col("text"))).as("h"))
      .distinct()
    val sk = h.orderBy(col("h")).limit(KMV_K)
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_min"))
    val ex = h.agg(count(lit(1)).as("exact_distinct"))
    sk.crossJoin(broadcast(ex))
      .withColumn("est_distinct",
        when(col("k_used") < KMV_K, col("k_used"))
          .otherwise(expr(s"(${KMV_K - 1} * ${P}L) div kth_min")))
      .withColumn("err_ppm",
        // empty corpus: est = exact = 0 → error 0, not divide-by-zero
        expr("IF(exact_distinct = 0, 0L," +
          " abs(est_distinct - exact_distinct) * 1000000" +
          " div exact_distinct)"))
      .select(col("k_used"), col("kth_min"), col("est_distinct"),
        col("exact_distinct"), col("err_ppm"))
  }

  private val qKmvDistinctSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT ${phSql("text")} AS h FROM documents),
       |sk AS (SELECT h FROM h ORDER BY h LIMIT $KMV_K),
       |agg AS (SELECT count(*) AS k_used, max(h) AS kth_min FROM sk),
       |ex AS (SELECT count(*) AS exact_distinct FROM h),
       |est AS (
       |  SELECT k_used, kth_min, exact_distinct,
       |    CASE WHEN k_used < $KMV_K THEN k_used
       |         ELSE (${KMV_K - 1} * CAST($P AS BIGINT)) // kth_min
       |    END AS est_distinct
       |  FROM agg, ex)
       |SELECT k_used, kth_min, est_distinct, exact_distinct,
       |  CASE WHEN exact_distinct = 0 THEN 0
       |       ELSE (abs(est_distinct - exact_distinct) * 1000000)
       |            // exact_distinct END
       |    AS err_ppm
       |FROM est""".stripMargin

  // --------------------------------------------------------- q_kmv_overlap
  /** Pairwise source-overlap estimation from per-source KMV sketches:
    * merge two sources' sketches, keep the K smallest of the union;
    * the fraction of those minima present in BOTH sketches estimates
    * the Jaccard similarity, and Jaccard × union-cardinality estimates
    * the intersection size. This is the sub-linear twin of the exact
    * `q_source_overlap`: at 100 TB the exact pass shuffles every
    * distinct text hash once per pair, while the sketch path ships
    * K·n_sources 8-byte values to one task. Exact intersection counts
    * ride along as calibration.
    *
    * Scale: per-source sketches are a `row_number` window PARTITIONED
    * by source with a constant-K cutoff (bounded frame — the
    * [[graft.plans.PartitionedTopK]] shape); the pair expansion joins
    * the tiny source-pair frame ('''broadcast''') against sketches of
    * ≤ K rows per source, and the merge window is partitioned by pair
    * over ≤ 2K rows. Nothing here scales with corpus size except the
    * initial distinct-hash pass.
    */
  private val OV_K = 128

  private def qKmvOverlap(s: SparkSession, d: String): DataFrame = {
    val hs = Tables.documents(s, d)
      .select(col("source"), mixed(poly_hash(col("text"))).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sk = hs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rk") <= OV_K)
      .select(col("source"), col("h"))
    val srcs = hs.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .crossJoin(srcs.select(col("source").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    val fromA = sk.join(broadcast(pairs), col("source") === col("src_a"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1).as("ia"), lit(0).as("ib"))
    val fromB = sk.join(broadcast(pairs), col("source") === col("src_b"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0).as("ia"), lit(1).as("ib"))
    val merged = fromA.union(fromB)
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("ia")).as("in_a"), max(col("ib")).as("in_b"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
      .filter(col("rk") <= OV_K)
    val est = merged
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_merged"),
        sum(col("in_a") * col("in_b")).as("n_both"),
        max(col("h")).as("kth"))
      .withColumn("union_est",
        when(col("n_merged") < OV_K, col("n_merged"))
          .otherwise(expr(s"(${OV_K - 1} * ${P}L) div kth")))
      .withColumn("jaccard_ppm",
        expr("n_both * 1000000 div n_merged"))
      .withColumn("inter_est", expr("n_both * union_est div n_merged"))
    val exact = hs.select(col("source").as("src_a"), col("h"))
      .join(hs.select(col("source").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val out = est.join(exact, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_both"),
        col("jaccard_ppm"), col("union_est"), col("inter_est"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
    hs.unpersist()
    out
  }

  private val qKmvOverlapSql: String =
    s"""WITH hs AS (
       |  SELECT DISTINCT source, ${phSql("text")} AS h FROM documents),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      row_number() OVER (PARTITION BY source ORDER BY h) AS rk
       |    FROM hs) WHERE rk <= $OV_K),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM (SELECT DISTINCT source FROM hs) a,
       |       (SELECT DISTINCT source FROM hs) b
       |  WHERE a.source < b.source),
       |expanded AS (
       |  SELECT p.src_a, p.src_b, s.h, 1 AS ia, 0 AS ib
       |  FROM sk s JOIN pairs p ON s.source = p.src_a
       |  UNION ALL
       |  SELECT p.src_a, p.src_b, s.h, 0 AS ia, 1 AS ib
       |  FROM sk s JOIN pairs p ON s.source = p.src_b),
       |merged AS (
       |  SELECT * FROM (
       |    SELECT src_a, src_b, h, max(ia) AS in_a, max(ib) AS in_b,
       |      row_number() OVER (PARTITION BY src_a, src_b
       |                         ORDER BY h) AS rk
       |    FROM expanded GROUP BY src_a, src_b, h)
       |  WHERE rk <= $OV_K),
       |est AS (
       |  SELECT src_a, src_b, count(*) AS n_merged,
       |    CAST(sum(in_a * in_b) AS BIGINT) AS n_both, max(h) AS kth
       |  FROM merged GROUP BY src_a, src_b),
       |est2 AS (
       |  SELECT src_a, src_b, n_merged, n_both,
       |    CASE WHEN n_merged < $OV_K THEN n_merged
       |         ELSE (${OV_K - 1} * CAST($P AS BIGINT)) // kth
       |    END AS union_est
       |  FROM est),
       |exact AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    count(*) AS exact_inter
       |  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT e.src_a, e.src_b, e.n_both,
       |  (e.n_both * 1000000) // e.n_merged AS jaccard_ppm,
       |  e.union_est,
       |  (e.n_both * e.union_est) // e.n_merged AS inter_est,
       |  COALESCE(x.exact_inter, 0) AS exact_inter
       |FROM est2 e LEFT JOIN exact x
       |  ON e.src_a = x.src_a AND e.src_b = x.src_b""".stripMargin

  // ----------------------------------------------------------- q_countmin
  /** Count-min sketch calibration over token frequencies: D=3 hash
    * rows × B=512 buckets of summed counts; a token's estimate is the
    * MINIMUM of its D bucket counts (each bucket over-counts by
    * whatever else collided into it, never under-counts). Reported for
    * the exact top-20 tokens with the overestimate in ppm — the
    * accuracy readout that sizes B before relying on the sketch.
    *
    * Scale: the sketch is D·B = 1536 counters regardless of corpus
    * size — the token stream aggregates by (row, bucket) with map-side
    * partial combine, so the shuffle carries at most 1536 rows per
    * partition. The exact top-20 (calibration only) is
    * `orderBy().limit(20)` → TakeOrderedAndProject, and the
    * counter⋈top-20 join broadcasts the 1536-row sketch. At 100 TB
    * only the counters and the top-k survive the map phase.
    */
  private[graft] val CMS_B = 512
  private[graft] val CMS_D = 3

  /** Row-i bucket of a token hash (same affine family as MinHash). */
  private[graft] def bucket(x: Column, i: Int): Column =
    ((x * (i * 2 + 1) + i * 12345L) % P) % CMS_B

  /** Expand a hash column `x` into its D (row_i, bkt) sketch cells —
    * shared with [[graft.streaming.StreamingCountmin]] so the online
    * counters stay value-identical to the batch ones by construction.
    */
  private[graft] def cmsCells(df: DataFrame): DataFrame =
    df.select(explode(array((0 until CMS_D).map { i =>
        struct(lit(i).as("row_i"), bucket(col("x"), i).as("bkt"))
      }: _*)).as("rb"))
      .select(col("rb.row_i").as("row_i"), col("rb.bkt").as("bkt"))

  private def qCountmin(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("tok"), mixed(poly_hash(col("tok"))).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counters = cmsCells(toks)
      .groupBy(col("row_i"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val top = toks.groupBy(col("tok"), col("x"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok")).limit(20)
    val est = top
      .select(col("tok"), col("x"), col("exact_n"),
        explode(array((0 until CMS_D).map { i =>
          struct(lit(i).as("row_i"), bucket(col("x"), i).as("bkt"))
        }: _*)).as("rb"))
      .select(col("tok"), col("exact_n"),
        col("rb.row_i").as("row_i"), col("rb.bkt").as("bkt"))
      .join(broadcast(counters), Seq("row_i", "bkt"))
      .groupBy(col("tok"), col("exact_n"))
      .agg(min(col("cnt")).as("cms_est"))
      .withColumn("over_ppm",
        expr("(cms_est - exact_n) * 1000000 div exact_n"))
      .select(col("tok"), col("exact_n"), col("cms_est"), col("over_ppm"))
    toks.unpersist()
    est
  }

  private val qCountminSql: String = {
    val bkts = (0 until CMS_D).map { i =>
      s"SELECT x, $i AS row_i, ((x * ${i * 2 + 1} + ${i}*12345) % $P) % $CMS_B AS bkt FROM xs"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents),
       |toks2 AS (
       |  SELECT tok, ${phSql("tok")} AS x FROM toks
       |  WHERE length(tok) > 0),
       |xs AS (SELECT x FROM toks2),
       |rb AS (
       |  $bkts),
       |counters AS (
       |  SELECT row_i, bkt, count(*) AS cnt FROM rb GROUP BY 1, 2),
       |top AS (
       |  SELECT tok, x, count(*) AS exact_n FROM toks2
       |  GROUP BY tok, x ORDER BY exact_n DESC, tok LIMIT 20),
       |est AS (
       |  SELECT t.tok, t.exact_n, min(c.cnt) AS cms_est
       |  FROM top t
       |  CROSS JOIN generate_series(0, ${CMS_D - 1}) gs(i)
       |  JOIN counters c
       |    ON c.row_i = gs.i
       |   AND c.bkt = ((t.x * (gs.i * 2 + 1) + gs.i * 12345) % $P) % $CMS_B
       |  GROUP BY t.tok, t.exact_n)
       |SELECT tok, exact_n, cms_est,
       |  ((cms_est - exact_n) * 1000000) // exact_n AS over_ppm
       |FROM est""".stripMargin
  }

  // ------------------------------------------------------- q_kmv_groups
  /** Per-group KMV cardinality — the production shape of the sketch:
    * `GROUP BY event_type, approx distinct users`. Each group keeps
    * its own K smallest distinct user hashes; estimate next to the
    * exact `count_distinct` and the ppm error, per group.
    *
    * Scale: the per-group K minima are a `row_number` window
    * PARTITIONED by group with a constant-K cutoff (the bounded
    * [[graft.plans.PartitionedTopK]] shape — each task keeps K rows
    * per group, no global sort), so the sketch pass shuffles distinct
    * (group, hash) pairs once and the estimate is one K-row
    * aggregation per group. The exact twin rides along as calibration;
    * at 100 TB it is what this query's sketch column REPLACES —
    * `count_distinct` shuffles every distinct pair AND holds each
    * group's full key set in the aggregation hash map, where KMV
    * holds K longs.
    */
  private val GRP_K = 64

  private def qKmvGroups(s: SparkSession, d: String): DataFrame = {
    val hs = Tables.events(s, d)
      .select(col("event_type"),
        mixed((col("user_id") * 31 + 7) % P).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sk = hs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("h"))))
      .filter(col("rk") <= GRP_K)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_min"))
      .withColumn("est_users",
        when(col("k_used") < GRP_K, col("k_used"))
          .otherwise(expr(s"(${GRP_K - 1} * ${P}L) div kth_min")))
    val exact = hs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_users"))
    val out = sk.join(exact, Seq("event_type"))
      .withColumn("err_ppm",
        expr("abs(est_users - exact_users) * 1000000 div exact_users"))
      .select(col("event_type"), col("k_used"), col("est_users"),
        col("exact_users"), col("err_ppm"))
    hs.unpersist()
    out
  }

  private val qKmvGroupsSql: String =
    s"""WITH hs AS (
       |  SELECT DISTINCT event_type,
       |    (((user_id * 31 + 7) % $P) * $MIX_A + $MIX_B) % $P AS h
       |  FROM events),
       |sk AS (
       |  SELECT event_type, count(*) AS k_used, max(h) AS kth_min
       |  FROM (
       |    SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
       |    FROM hs)
       |  WHERE rk <= $GRP_K
       |  GROUP BY event_type),
       |est AS (
       |  SELECT event_type, k_used,
       |    CASE WHEN k_used < $GRP_K THEN k_used
       |         ELSE (${GRP_K - 1} * CAST($P AS BIGINT)) // kth_min
       |    END AS est_users
       |  FROM sk),
       |exact AS (
       |  SELECT event_type, count(*) AS exact_users FROM hs
       |  GROUP BY event_type)
       |SELECT e.event_type, s.k_used, s.est_users, e.exact_users,
       |  (abs(s.est_users - e.exact_users) * 1000000) // e.exact_users
       |    AS err_ppm
       |FROM est s JOIN exact e ON s.event_type = e.event_type""".stripMargin

  // ---------------------------------------------------- q_sample_quantiles
  /** Sample-based quantile estimation, calibrated: exact percentiles
    * require a full sort of the value column per group — at 100 TB
    * that is the single most expensive aggregate in the suite. The
    * scale path computes quantiles over a deterministic ~6% hash
    * sample (md5 of the row key — stable across engines,
    * partitionings, and reruns; the `q_hash_sample` idiom) and this
    * query reports the estimate NEXT TO the exact value with the
    * error in ppm — the evidence that sizes the sample rate before a
    * rollout trusts it.
    *
    * Scale: the sample filter is map-only and pushed to the scan side
    * of the aggregation; only ~6% of values enter the sort. The two
    * single-row aggregates meet in a '''broadcast''' cross join.
    */
  private def qSampleQuantiles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val samp = li.filter(
      conv(substring(md5(concat_ws("-",
        col("l_orderkey"), col("l_linenumber"))), 1, 8), 16, 10)
        .cast("long") % 16 === 0)
    val sq = samp.agg(
      count(lit(1)).as("n_sample"),
      expr("percentile(l_extendedprice, 0.5)").as("s_p50"),
      expr("percentile(l_extendedprice, 0.95)").as("s_p95"))
    val fq = li.agg(
      count(lit(1)).as("n_pop"),
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.95)").as("p95"))
    fq.crossJoin(broadcast(sq))
      // floor, not CAST: Spark truncates double→bigint, DuckDB rounds —
      // floor() agrees everywhere
      .withColumn("err50_ppm",
        expr("floor(abs(s_p50 - p50) * 1000000 / p50)"))
      .withColumn("err95_ppm",
        expr("floor(abs(s_p95 - p95) * 1000000 / p95)"))
      .select(col("n_pop"), col("n_sample"), col("p50"), col("p95"),
        col("s_p50"), col("s_p95"), col("err50_ppm"), col("err95_ppm"))
  }

  private val qSampleQuantilesSql: String =
    """WITH samp AS (
      |  SELECT l_extendedprice FROM lineitem
      |  WHERE CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
      |          CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 16 = 0),
      |sq AS (
      |  SELECT count(*) AS n_sample,
      |    quantile_cont(l_extendedprice, 0.5) AS s_p50,
      |    quantile_cont(l_extendedprice, 0.95) AS s_p95
      |  FROM samp),
      |fq AS (
      |  SELECT count(*) AS n_pop,
      |    quantile_cont(l_extendedprice, 0.5) AS p50,
      |    quantile_cont(l_extendedprice, 0.95) AS p95
      |  FROM lineitem)
      |SELECT n_pop, n_sample, p50, p95, s_p50, s_p95,
      |  CAST(floor(abs(s_p50 - p50) * 1000000 / p50) AS BIGINT) AS err50_ppm,
      |  CAST(floor(abs(s_p95 - p95) * 1000000 / p95) AS BIGINT) AS err95_ppm
      |FROM fq, sq""".stripMargin

  // ------------------------------------------------------------------ q_hll
  /** HyperLogLog cardinality of distinct document texts — the
    * fixed-size (m registers, here 64 bytes) companion to
    * [[qKmvDistinct]]'s K-minima sketch, run as the same
    * exactness-contract calibration: registers, raw estimate, exact
    * count, error ppm. ALL-INTEGER HLL: register and rank come from
    * two NON-LINEAR derivations of the mixed hash — g₁ = h²+h mod P
    * for j = g₁ mod m, g₂ = (h+1)²+h mod P for the rank word
    * w = g₂ div m < 2^[[HLL_RANK_BITS]]. The squaring is load-bearing:
    * [[mixed]]'s affine map keeps sequential-suffix corpora on a 2-D
    * LATTICE, so register index and rank stay correlated and the
    * high-ρ values pile into few registers (measured: 2.3×
    * underestimate at n=2000); squaring mod P breaks the lattice while
    * staying int64-exact (P² < 2⁶³) on both engines — the same reason
    * splitmix-style finalizers exist, without the 64-bit wraparound
    * DuckDB's BIGINT refuses. ρ = leading-zero count + 1 derived from
    * `length(bin(w))` (identical string semantics on
    * both engines — no float log2), and the harmonic denominator
    * Σ 2^(−M_j) scaled by 2^[[HLL_SCALE]] into an exact integer via
    * bit shifts, so `est = α_m·m²·2^SCALE div (Z_scaled·1000)` (α_64
    * = 0.709, Flajolet–Fuss–Gandouet–Meunier 2007, baked in as
    * 709/1000) is bit-identical cross-engine. The small-range
    * linear-counting branch needs ln — kept OUT of the oracle-checked
    * surface; `n_empty` rides along so a consumer can apply it.
    *
    * Scale: one (register)-keyed max agg — 64 groups, partials
    * collapse map-side, and the mergeable state is 64 bytes per
    * partition vs KMV's K·8 — the reason HLL is the default at
    * 100 TB. The distinct-hash pre-agg dominates and is exactly the
    * cost `count_distinct` (the calibration twin) already pays.
    */
  private val HLL_M = 64L
  private val HLL_RANK_BITS = 24L
  private val HLL_SCALE = 30L

  /** Scala reference of the (register, rank-word) derivation —
    * shared with the spec recompute so impl and test cannot drift.
    */
  private[graft] def hllJW(h: Long): (Int, Long) = {
    val g1 = (h * h + h) % P
    val g2 = ((h + 1) * (h + 1) + h) % P
    ((g1 % HLL_M).toInt, g2 / HLL_M)
  }

  /** Column twins of [[hllJW]] + ρ, shared with the streaming sketch
    * ([[graft.streaming.StreamingHll]]) so online registers match the
    * batch ones by construction. Input: the mixed hash column named
    * `h`; output: (register j, ρ).
    */
  private[graft] def hllRegRho: (Column, Column) = {
    val w = expr(s"(((h + 1) * (h + 1) + h) % $P) div $HLL_M")
    (expr(s"((h * h + h) % $P) % $HLL_M"),
      when(w === 0L, lit(HLL_RANK_BITS + 1))
        .otherwise(lit(HLL_RANK_BITS) - length(bin(w)) + 1))
  }

  private def qHll(s: SparkSession, d: String): DataFrame = {
    val h = Tables.documents(s, d)
      .select(mixed(poly_hash(col("text"))).as("h"))
      .distinct()
    val (jc, rhoc) = hllRegRho
    val regs = h
      .select(jc.as("j"), rhoc.as("rho"))
      .groupBy(col("j")).agg(max(col("rho")).as("m_j"))
    val sk = regs.agg(count(lit(1)).as("n_present"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT)," +
        s" CAST($HLL_SCALE - m_j AS INT))")).as("z_present"))
    val ex = h.agg(count(lit(1)).as("exact_distinct"))
    sk.crossJoin(broadcast(ex))
      .withColumn("n_empty", lit(HLL_M) - col("n_present"))
      .withColumn("z_scaled",
        col("z_present") + col("n_empty") * (1L << HLL_SCALE))
      .withColumn("est_distinct", expr(
        s"(709 * ${HLL_M * HLL_M} * ${1L << HLL_SCALE}L)" +
          s" div (z_scaled * 1000)"))
      .withColumn("err_ppm", expr(
        "abs(est_distinct - exact_distinct) * 1000000 div exact_distinct"))
      .select(col("n_empty"), col("z_scaled"), col("est_distinct"),
        col("exact_distinct"), col("err_ppm"))
  }

  private val qHllSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT ${phSql("text")} AS h FROM documents),
       |jw AS (
       |  SELECT ((h * h + h) % $P) % $HLL_M AS j,
       |    (((h + 1) * (h + 1) + h) % $P) // $HLL_M AS w
       |  FROM h),
       |regs AS (
       |  SELECT j,
       |    max(CASE WHEN w = 0 THEN ${HLL_RANK_BITS + 1}
       |        ELSE $HLL_RANK_BITS - length(bin(w)) + 1 END) AS m_j
       |  FROM jw GROUP BY 1),
       |sk AS (
       |  SELECT count(*) AS n_present,
       |    sum(1 << ($HLL_SCALE - m_j)) AS z_present
       |  FROM regs),
       |ex AS (SELECT count(*) AS exact_distinct FROM h),
       |est AS (
       |  SELECT CAST($HLL_M - n_present AS BIGINT) AS n_empty,
       |    CAST(z_present + ($HLL_M - n_present) * ${1L << HLL_SCALE}
       |         AS BIGINT) AS z_scaled,
       |    exact_distinct
       |  FROM sk, ex)
       |SELECT n_empty, z_scaled,
       |  CAST((CAST(709 AS BIGINT) * ${HLL_M * HLL_M} * ${1L << HLL_SCALE})
       |       // (z_scaled * 1000) AS BIGINT) AS est_distinct,
       |  exact_distinct,
       |  CAST(abs((CAST(709 AS BIGINT) * ${HLL_M * HLL_M}
       |            * ${1L << HLL_SCALE})
       |           // (z_scaled * 1000) - exact_distinct) * 1000000
       |       // exact_distinct AS BIGINT) AS err_ppm
       |FROM est""".stripMargin

  // --------------------------------------------------- q_active_users_hll
  /** Sketch-path DAU/WAU/MAU — the REGISTERED, oracle-checked batch
    * form of the warehouse-scale swap `q_active_users`' scaladoc
    * promises (and [[graft.streaming.StreamingDau]] maintains live):
    * per-day 64-register HyperLogLog sketches of the active users,
    * OR-merged (register-wise max) across trailing 7/28-day windows,
    * next to the exact trailing distincts under the exactness-contract
    * pattern (estimate, exact, error in ppm per window).
    *
    * Why this is THE 100 TB path: the exact twin fans out the
    * user-day frame ×7/×28 and re-distincts per day — linear but a
    * 28× constant on the corpus's dominant frame. Here the fanout
    * unit is the REGISTER frame: ≤ [[HLL_M]] rows per active day
    * regardless of event volume, so the whole trailing merge moves
    * O(days · 64 · 28) 8-byte values — calendar-bounded, volume-free.
    * The corpus is touched once (one distinct + one register agg,
    * both map-side combining); everything after is sketch algebra.
    * Register/ρ derivations are shared with [[qHll]]/[[hllRegRho]] and
    * `StreamingDau`, so batch sketch, oracle, and live store agree by
    * construction (mergeability law spec-pinned in `StreamingDauSpec`).
    *
    * Days reported: days with own activity (join on the DAU day
    * frame), mirroring `q_active_users` exactly.
    */
  /** Per-day integer HLL readout over a (day, j, m_j) register frame —
    * the same algebra as [[qHll]], grouped by day. Shared by the batch
    * [[qActiveUsersHll]] and the live-store consumer
    * [[graft.streaming.StreamingDau.trailingEstimates]], so the two
    * paths agree by construction.
    */
  private[graft] def hllDayEstimate(regsW: DataFrame, out: String): DataFrame =
    regsW.groupBy(col("day"))
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT)," +
          s" CAST($HLL_SCALE - m_j AS INT))")).as("z_present"))
      .select(col("day"), expr(
        s"(709 * ${HLL_M * HLL_M} * ${1L << HLL_SCALE}L) div" +
          s" ((z_present + ($HLL_M - n_present) * ${1L << HLL_SCALE}L)" +
          s" * 1000)").as(out))

  /** Register-wise max of a (day, j, m_j) frame across each trailing
    * `w`-day window ending at `day` (capped at the frame's max day) —
    * the HLL OR-merge that turns the per-day store into WAU/MAU
    * registers. The fanout unit is the 64-row-per-day register frame,
    * never the corpus.
    */
  private[graft] def hllTrailingMerge(regs: DataFrame, w: Int): DataFrame = {
    val span = regs.agg(max(col("day")).as("max_day"))
    regs.crossJoin(broadcast(span))
      .select(col("j"), col("m_j"),
        explode(expr(s"sequence(day, least(day + ${w - 1}, max_day))"))
          .as("day"))
      .groupBy(col("day"), col("j")).agg(max(col("m_j")).as("m_j"))
  }

  private def qActiveUsersHll(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val (jc, rhoc) = hllRegRho
    val regs = ud
      .select(col("day"),
        mixed(poly_hash(col("user_id").cast("string"))).as("h"))
      .select(col("day"), jc.as("j"), rhoc.as("rho"))
      .groupBy(col("day"), col("j")).agg(max(col("rho")).as("m_j"))
      .transform(graft.Memo.checkpoint) // 64·days rows feed three estimates
    val span = regs.agg(max(col("day")).as("max_day"))
    def estimate(regsW: DataFrame, out: String): DataFrame =
      hllDayEstimate(regsW, out)
    def merged(w: Int): DataFrame = hllTrailingMerge(regs, w)
    // Exact trailing distincts — the calibration columns.
    val udCk = ud.transform(graft.Memo.checkpoint)
    def exact(w: Int, out: String): DataFrame =
      udCk.crossJoin(broadcast(span.withColumnRenamed("max_day", "md")))
        .select(col("user_id"),
          explode(expr(s"sequence(day, least(day + ${w - 1}, md))"))
            .as("day"))
        .groupBy(col("day"))
        .agg(count_distinct(col("user_id")).as(out))
    val dauE = udCk.groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("dau"))
    dauE
      .join(estimate(regs, "est_dau"), Seq("day"))
      .join(exact(7, "wau"), Seq("day"))
      .join(estimate(merged(7), "est_wau"), Seq("day"))
      .join(exact(28, "mau"), Seq("day"))
      .join(estimate(merged(28), "est_mau"), Seq("day"))
      .select(col("day"), col("est_dau"), col("dau"),
        col("est_wau"), col("wau"), col("est_mau"), col("mau"),
        expr("abs(est_dau - dau) * 1000000 div dau").as("err_dau_ppm"),
        expr("abs(est_wau - wau) * 1000000 div wau").as("err_wau_ppm"),
        expr("abs(est_mau - mau) * 1000000 div mau").as("err_mau_ppm"))
  }

  private val qActiveUsersHllSql: String = {
    val scale1 = 1L << HLL_SCALE
    val readout = (src: String, out: String) =>
      s"""SELECT day,
         |  CAST((CAST(709 AS BIGINT) * ${HLL_M * HLL_M} * $scale1)
         |    // ((sum(1 << ($HLL_SCALE - m_j))
         |         + ($HLL_M - count(*)) * $scale1) * 1000)
         |    AS BIGINT) AS $out
         |FROM $src GROUP BY 1""".stripMargin
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
       |  FROM events),
       |h AS (
       |  SELECT day, ${phSql("CAST(user_id AS VARCHAR)")} AS h FROM ud),
       |jw AS (
       |  SELECT day, ((h * h + h) % $P) % $HLL_M AS j,
       |    (((h + 1) * (h + 1) + h) % $P) // $HLL_M AS w
       |  FROM h),
       |regs AS (
       |  SELECT day, j,
       |    max(CASE WHEN w = 0 THEN ${HLL_RANK_BITS + 1}
       |        ELSE $HLL_RANK_BITS - length(bin(w)) + 1 END) AS m_j
       |  FROM jw GROUP BY 1, 2),
       |span AS (SELECT max(day) AS max_day FROM regs),
       |m7 AS (
       |  SELECT g.day, j, max(m_j) AS m_j
       |  FROM (SELECT j, m_j,
       |          unnest(range(day, least(day + 7,
       |                                  (SELECT max_day FROM span) + 1)))
       |            AS day
       |        FROM regs) g
       |  GROUP BY 1, 2),
       |m28 AS (
       |  SELECT g.day, j, max(m_j) AS m_j
       |  FROM (SELECT j, m_j,
       |          unnest(range(day, least(day + 28,
       |                                  (SELECT max_day FROM span) + 1)))
       |            AS day
       |        FROM regs) g
       |  GROUP BY 1, 2),
       |e_d AS (${readout("regs", "est_dau")}),
       |e_7 AS (${readout("m7", "est_wau")}),
       |e_28 AS (${readout("m28", "est_mau")}),
       |x_7 AS (
       |  SELECT g.day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
       |  FROM (SELECT user_id,
       |          unnest(range(day, least(day + 7,
       |                                  (SELECT max_day FROM span) + 1)))
       |            AS day
       |        FROM ud) g
       |  GROUP BY 1),
       |x_28 AS (
       |  SELECT g.day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
       |  FROM (SELECT user_id,
       |          unnest(range(day, least(day + 28,
       |                                  (SELECT max_day FROM span) + 1)))
       |            AS day
       |        FROM ud) g
       |  GROUP BY 1),
       |x_d AS (
       |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
       |  FROM ud GROUP BY 1)
       |SELECT x_d.day, est_dau, dau, est_wau, wau, est_mau, mau,
       |  CAST(abs(est_dau - dau) * 1000000 // dau AS BIGINT)
       |    AS err_dau_ppm,
       |  CAST(abs(est_wau - wau) * 1000000 // wau AS BIGINT)
       |    AS err_wau_ppm,
       |  CAST(abs(est_mau - mau) * 1000000 // mau AS BIGINT)
       |    AS err_mau_ppm
       |FROM x_d
       |JOIN e_d ON e_d.day = x_d.day
       |JOIN x_7 ON x_7.day = x_d.day
       |JOIN e_7 ON e_7.day = x_d.day
       |JOIN x_28 ON x_28.day = x_d.day
       |JOIN e_28 ON e_28.day = x_d.day""".stripMargin
  }

  // --------------------------------------------------------- q_selfjoin_est
  /** Self-join size (second frequency moment F₂ = Σ c_u²) estimation —
    * the cardinality-estimation primitive behind every optimizer's
    * "how big is this join" decision and the classic sketch benchmark:
    * exact F₂ of the per-user event counts vs the HEAVY-HITTER +
    * UNIFORM-TAIL estimator every histogram-based optimizer uses
    * (exact c² for the top-[[SJ_TOPK]] users, `rest_total² div
    * rest_distinct` for the remainder — the uniformity assumption is
    * exactly what the estimator gets wrong on skew, and err_ppm
    * REPORTS how wrong). The operating data for deciding when
    * statistics need a bigger heavy-hitter budget.
    *
    * Deterministic end to end: counts are exact integers, the top-K
    * cut is `orderBy().limit()` with id tie-break, the tail division
    * is floor on nonnegatives — both engines reproduce the estimate
    * bit-for-bit (F₂ terms route through DECIMAL(38,0)/HUGEINT; Σc²
    * crosses int64 at warehouse volumes).
    *
    * Scale: one user-keyed count agg; exact F₂ is one more ≤users
    * agg; the estimator reads the K-row TakeOrderedAndProject plus
    * two scalars. Nothing beyond the scan grows.
    */
  private val SJ_TOPK = 50

  private def qSelfjoinEst(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .transform(graft.Memo.checkpoint) // feeds exact, top-K, and totals
    selfjoinEstFromCounts(counts)
  }

  /** The estimator arithmetic over a pre-aggregated `(user_id, c)`
    * frame — split out so the overflow regime (Σc² > 2⁶³, unreachable
    * by materializing rows in a test) is unit-testable with synthetic
    * counts.
    */
  private[llm] def selfjoinEstFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val exact = counts.agg(
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("f2_exact"),
      count(lit(1)).as("n_users"), sum(col("c")).as("n_rows"))
    val top = counts.orderBy(col("c").desc, col("user_id"))
      .limit(SJ_TOPK)
      .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("f2_top"),
        count(lit(1)).as("k"), sum(col("c")).as("top_rows"))
    // f2_* stay DECIMAL(38,0) all the way OUT — a final BIGINT cast
    // would go NULL (Spark, non-ANSI) / error (DuckDB) exactly at the
    // warehouse volumes this query exists for. The tail quotient must
    // NOT use `div`: IntegralDivide always returns BIGINT, so a
    // quotient past 2⁶³ (tail² ≈ 10¹⁹ already does it) silently wraps
    // mod 2⁶⁴. `(x - pmod(x, m)) / m` is the same floor division kept
    // in decimal — the subtraction makes the divide exact, so the
    // decimal(38,6) division result is integral and the outer cast is
    // lossless. Holds inside 38 digits up to F₂ ≈ 10³² (n_rows ≈ 10¹⁶
    // events); err_ppm's ·10⁶ product likewise.
    // The two F₂ columns leave as canonical STRINGs: precision-38
    // decimals round-trip differently through different parquet
    // readers (Decimal object vs float64), so a hash over the raw
    // column diverges even when the values are bit-identical.
    // Integer decimal→string is deterministic in both engines; the
    // DECIMAL(38,0) math above is unchanged.
    exact.crossJoin(broadcast(top))
      .select(
        expr("CAST(f2_exact AS DECIMAL(38,0))").as("f2_exact_dec"),
        expr("""CAST(f2_top + (
               |  CAST(n_rows - top_rows AS DECIMAL(38,0))
               |    * (n_rows - top_rows)
               |  - pmod(CAST(n_rows - top_rows AS DECIMAL(38,0))
               |      * (n_rows - top_rows), greatest(n_users - k, 1))
               |) / greatest(n_users - k, 1) AS DECIMAL(38,0))"""
          .stripMargin.replace("\n", " ")).as("f2_est_dec"),
        col("n_users"), col("n_rows"))
      .select(
        expr("CAST(f2_exact_dec AS STRING)").as("f2_exact"),
        expr("CAST(f2_est_dec AS STRING)").as("f2_est"),
        col("n_users"), col("n_rows"),
        expr("CAST(abs(f2_est_dec - f2_exact_dec) * 1000000" +
          " div f2_exact_dec AS BIGINT)").as("err_ppm"))
  }

  private val qSelfjoinEstSql: String =
    s"""WITH counts AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |exact AS (
       |  SELECT sum(CAST(c AS HUGEINT) * c) AS f2_exact,
       |    CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(c) AS BIGINT) AS n_rows
       |  FROM counts),
       |top AS (
       |  SELECT sum(CAST(c AS HUGEINT) * c) AS f2_top,
       |    CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(c) AS BIGINT) AS top_rows
       |  FROM (
       |    SELECT c, user_id FROM counts
       |    ORDER BY c DESC, user_id LIMIT $SJ_TOPK))
       |SELECT CAST(CAST(f2_exact AS DECIMAL(38,0)) AS VARCHAR)
       |    AS f2_exact,
       |  CAST(CAST(f2_top +
       |    CAST(n_rows - top_rows AS HUGEINT) * (n_rows - top_rows)
       |      // greatest(n_users - k, 1) AS DECIMAL(38,0)) AS VARCHAR)
       |    AS f2_est,
       |  n_users, n_rows,
       |  CAST(abs(CAST(f2_top +
       |      CAST(n_rows - top_rows AS HUGEINT) * (n_rows - top_rows)
       |        // greatest(n_users - k, 1) AS HUGEINT) - f2_exact)
       |    * 1000000 // f2_exact AS BIGINT) AS err_ppm
       |FROM exact, top""".stripMargin

  // -------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_selfjoin_est" -> qSelfjoinEst,
    "q_active_users_hll" -> qActiveUsersHll,
    "q_hll" -> qHll,
    "q_kmv_distinct" -> qKmvDistinct,
    "q_kmv_overlap" -> qKmvOverlap,
    "q_countmin" -> qCountmin,
    "q_kmv_groups" -> qKmvGroups,
    "q_sample_quantiles" -> qSampleQuantiles
  )

  val oracles: Map[String, String] = Map(
    "q_selfjoin_est" -> qSelfjoinEstSql,
    "q_active_users_hll" -> qActiveUsersHllSql,
    "q_hll" -> qHllSql,
    "q_kmv_distinct" -> qKmvDistinctSql,
    "q_kmv_overlap" -> qKmvOverlapSql,
    "q_countmin" -> qCountminSql,
    "q_kmv_groups" -> qKmvGroupsSql,
    "q_sample_quantiles" -> qSampleQuantilesSql
  )
}
