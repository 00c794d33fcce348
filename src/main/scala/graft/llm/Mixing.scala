package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators: source-weighted mixture sampling and
  * inter-document boilerplate detection — the two passes that sit
  * between curation and training-set assembly in a data pipeline
  * (weight the sources to a target mixture; strip the template text
  * that repeats ACROSS documents, which per-document quality signals
  * like `q_repetition` cannot see).
  *
  * Reference provenance: the reference engine has no corpus surface
  * (`/root/reference/readme.md:1-5`); these extend the LLM-pipeline
  * set SURVEY.md §2.3 mandates.
  */
object Mixing {

  // ------------------------------------------------------------ q_mixture
  /** Source-weighted mixture sampling: given a target weight per
    * source, draw a deterministic sample whose per-source counts
    * follow the weights — the "data mixing" step that rebalances a
    * multi-source corpus to a training recipe.
    *
    * Weights here derive from the source id (wt = (n mod 4) + 1 for
    * srcN) standing in for the recipe table; a real recipe arrives as
    * a small broadcast map the same way. Per-source quota =
    * floor(SAMPLE_N · wt / Σwt) with Σwt computed from the sources
    * actually present (data-driven, not hardcoded). Selection order is
    * md5(doc_id) — content- and layout-independent, so the sample is
    * stable under repartitioning and reproducible across engines.
    *
    * Scale: the weight/quota frame is #sources rows → '''broadcast'''
    * both into the scalar Σwt and into the per-row quota join. The
    * rank is a window per source; quotas are small constants, so at
    * 100 TB this window becomes the bounded per-key top-k
    * ([[graft.plans.PartitionedTopK]] — same pattern as
    * `q_topk_per_key`): each task keeps quota rows per source and the
    * full sort never materializes. The md5 order key also means no
    * source's sample concentrates in any input split — no skew from
    * file ordering.
    */
  private val SAMPLE_N = 200

  private def qMixture(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val w = docs.select(col("source")).distinct()
      .withColumn("wt",
        (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("long"))
    val sw = w.agg(sum(col("wt")).as("sw"))
    val quota = w.crossJoin(broadcast(sw))
      .select(col("source"),
        expr(s"CAST($SAMPLE_N * wt AS BIGINT) div sw").as("quota"))
    val ranked = docs
      .select(col("doc_id"), col("source"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
    ranked.join(broadcast(quota), Seq("source"))
      .filter(col("rnk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rnk"))
  }

  private val qMixtureSql: String =
    s"""WITH w AS (
       |  SELECT DISTINCT source,
       |    CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS BIGINT) AS wt
       |  FROM documents),
       |sw AS (SELECT SUM(wt) AS sw FROM w),
       |quota AS (
       |  SELECT source, CAST($SAMPLE_N * wt AS BIGINT) // (SELECT sw FROM sw) AS quota
       |  FROM w),
       |ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
       |  FROM documents)
       |SELECT r.doc_id, r.source, r.rnk
       |FROM ranked r JOIN quota q ON q.source = r.source
       |WHERE r.rnk <= q.quota""".stripMargin

  // -------------------------------------------------------- q_boilerplate
  /** Inter-document boilerplate detection: a word-3-gram that occurs
    * in ≥ MIN_DOCS DISTINCT documents is template text (headers,
    * footers, navigation, license blurbs); each document is scored by
    * the fraction of its 3-gram occurrences that are boilerplate.
    * This is the cross-document complement of `q_repetition` (which
    * sees only WITHIN-document repeats) — the RefinedWeb-style
    * template filter.
    *
    * Scale: grams are md5-prefix-hashed to BIGINT before the shuffle
    * (8 bytes, not strings — same move as q_contamination), and the
    * hashed frame is persisted because it feeds both the corpus
    * distinct-doc count and the per-doc score. The boilerplate set is
    * frequency-bounded (every member occurs ≥ MIN_DOCS times, so
    * |set| ≤ corpus-grams / MIN_DOCS, and template vocabulary in real
    * corpora is tiny) → '''broadcast''' into the scoring join; the
    * scoring pass is map-only + one per-doc count aggregation.
    */
  private val MIN_DOCS = 4

  private def qBoilerplate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val grams = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 3), " +
          "i -> array_join(slice(tk, i + 1, 3), ' '))")).as("g"))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long").as("gh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boiler = grams.groupBy(col("gh"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= MIN_DOCS)
      .select(col("gh"), lit(1).as("hit"))
    grams.join(broadcast(boiler), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("hit")).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_grams")).as("boiler_frac"))
      .withColumn("is_template", col("boiler_frac") > 0.5)
  }

  private val qBoilerplateSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS tk
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS gh
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
       |      i -> array_to_string(tk[i+1:i+3], ' '))) AS g
       |    FROM tok WHERE len(tk) >= 3)),
       |boiler AS (
       |  SELECT gh FROM grams GROUP BY gh
       |  HAVING count(DISTINCT doc_id) >= $MIN_DOCS),
       |agg AS (
       |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(count(b.gh) AS BIGINT) AS n_boiler
       |  FROM grams g LEFT JOIN boiler b ON b.gh = g.gh
       |  GROUP BY 1)
       |SELECT doc_id, n_grams, n_boiler,
       |  CAST(n_boiler AS DOUBLE) / n_grams AS boiler_frac,
       |  CAST(n_boiler AS DOUBLE) / n_grams > 0.5 AS is_template
       |FROM agg""".stripMargin

  // ----------------------------------------------------------- q_source_sim
  /** Source-to-source corpus similarity — the pairwise readout a
    * mixture designer consults before weighting ([[qMixture]] decides
    * HOW MUCH of each source; this measures HOW REDUNDANT two sources
    * are): total-variation distance between per-source term
    * distributions, TV = ½·Σ_t |p_a(t) − p_b(t)|. TV is the exact,
    * bounded alternative to cosine here — shares are integer ppb
    * (`floor(1e9·c/n)`), every |difference| ≤ 1e9 and every sum ≤ 1e9
    * (shares sum to ≤ 1e9 per source), so NOTHING approaches overflow
    * at any corpus size, where a cosine's Σc_a·c_b squares raw counts
    * past DECIMAL(38,0) at warehouse volumes. Terms present in only
    * one source contribute their full share: TV·2 = Σ_common|s_a−s_b|
    * + (S_a − Σ_common s_a) + (S_b − Σ_common s_b) with S_x the
    * per-source share totals — so only COMMON terms ever join.
    *
    * Scale: one (source, term) hash agg; the pair join is keyed on
    * TERM with fanout ≤ sources² per term — sources are metadata-
    * bounded (a recipe enumerates them), so the join never goes
    * quadratic in the corpus; per-source totals are a ≤|sources|-row
    * frame → '''broadcast'''. Output is sources²/2 rows.
    */
  private def qSourceSim(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text")))
        .as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val tot = tf.groupBy(col("source"))
      .agg(sum(col("c")).as("n"))
    val share = tf.join(broadcast(tot), Seq("source"))
      .withColumn("num", expr("CAST(c AS DECIMAL(38,0)) * 1000000000"))
      .withColumn("s", expr("CAST((num - num % n) / n AS BIGINT)"))
      .select(col("source"), col("term"), col("s"))
    val stot = share.groupBy(col("source")).agg(sum(col("s")).as("s_tot"))
    share.alias("a")
      .join(share.alias("b"),
        col("a.term") === col("b.term") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"),
        sum(abs(col("a.s") - col("b.s"))).as("gap"),
        sum(col("a.s")).as("ca"), sum(col("b.s")).as("cb"))
      .join(broadcast(stot).withColumnRenamed("source", "source_a")
        .withColumnRenamed("s_tot", "sa_tot"), Seq("source_a"))
      .join(broadcast(stot).withColumnRenamed("source", "source_b")
        .withColumnRenamed("s_tot", "sb_tot"), Seq("source_b"))
      .withColumn("tv_ppb", expr(
        "(gap + (sa_tot - ca) + (sb_tot - cb)) div 2"))
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("tv_ppb"))
  }

  private val qSourceSimSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT source, term, CAST(count(*) AS BIGINT) AS c
      |  FROM tok WHERE term <> '' GROUP BY 1, 2),
      |tot AS (SELECT source, sum(c) AS n FROM tf GROUP BY 1),
      |share AS (
      |  SELECT tf.source, tf.term,
      |    CAST(CAST(tf.c AS HUGEINT) * 1000000000 // tot.n AS BIGINT) AS s
      |  FROM tf JOIN tot USING (source)),
      |stot AS (SELECT source, CAST(sum(s) AS BIGINT) AS s_tot
      |         FROM share GROUP BY 1),
      |pair AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    CAST(count(*) AS BIGINT) AS n_common,
      |    CAST(sum(abs(a.s - b.s)) AS BIGINT) AS gap,
      |    CAST(sum(a.s) AS BIGINT) AS ca,
      |    CAST(sum(b.s) AS BIGINT) AS cb
      |  FROM share a JOIN share b
      |    ON a.term = b.term AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b, n_common,
      |  CAST((gap + (ta.s_tot - ca) + (tb.s_tot - cb)) // 2 AS BIGINT)
      |    AS tv_ppb
      |FROM pair
      |JOIN stot ta ON ta.source = pair.source_a
      |JOIN stot tb ON tb.source = pair.source_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mixture"     -> qMixture _,
    "q_boilerplate" -> qBoilerplate _,
    "q_source_sim"  -> qSourceSim _
  )

  val oracles: Map[String, String] = Map(
    "q_mixture"     -> qMixtureSql,
    "q_boilerplate" -> qBoilerplateSql,
    "q_source_sim"  -> qSourceSimSql
  )
}
