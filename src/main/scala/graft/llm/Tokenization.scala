package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Character/subword-level corpus operators — the tokenizer-training
  * and substring-duplication side of the pipeline, complementing the
  * word-level ops in [[TextAnalysis]] and the shingle-set near-dup
  * family in [[Dedup]].
  *
  * Reference provenance: none (the reference is a CDC pipeline,
  * `/root/reference/readme.md:1-5`); extends SURVEY.md §2.3's LLM
  * operator mandate.
  */
object Tokenization {

  // ------------------------------------------------------------ q_bpe_merge
  /** One BPE vocabulary-induction step — the pair-counting pass a
    * byte-pair-encoding tokenizer trainer runs per merge: weight every
    * adjacent CHARACTER pair inside each word type by the word's corpus
    * frequency (pair count = Σ_word freq(word) · occurrences(pair in
    * word)), rank the top-[[BPE_TOP]] merge candidates. A full trainer
    * loops this, merging the winner into a new symbol each round —
    * every round is this same query over a rewritten symbol table.
    *
    * Scale: the pair expansion runs over the DISTINCT word table
    * (vocabulary-sized — the corpus collapses to (word, freq) first),
    * never over the corpus text; adjacent pairs materialize map-side
    * from `substring(w, i, 2)` and only (pair, count) rows shuffle.
    * Top-k plans as TakeOrderedAndProject.
    */
  private val BPE_TOP = 20

  private def qBpeMerge(s: SparkSession, d: String): DataFrame = {
    val wc = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    wc.filter(char_length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("c"))
      .groupBy(col("pair")).agg(sum(col("c")).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(BPE_TOP)
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("n").desc, col("pair")))
        .cast(IntegerType))
  }

  private val qBpeMergeSql: String =
    s"""WITH w AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents),
       |wc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM w WHERE w <> '' GROUP BY 1),
       |p AS (
       |  SELECT unnest(list_transform(range(1, length(w)),
       |    i -> substring(w, i, 2))) AS pair, c
       |  FROM wc WHERE length(w) >= 2),
       |agg AS (SELECT pair, CAST(sum(c) AS BIGINT) AS n FROM p GROUP BY 1)
       |SELECT pair, n, CAST(rnk AS INTEGER) AS rnk FROM (
       |  SELECT *, row_number() OVER (ORDER BY n DESC, pair) AS rnk
       |  FROM agg)
       |WHERE rnk <= $BPE_TOP""".stripMargin

  // ------------------------------------------------------------ q_bpe_iter
  /** Three rounds of the ACTUAL BPE training loop — [[qBpeMerge]] is
    * one pair-count pass; a trainer alternates count → merge-winner →
    * rewrite, and the rewrite is what makes round N+1's counts differ
    * from round N's. The merged pair collapses to one private-use-area
    * symbol char (U+E000, U+E001), so every round's "adjacent pair" is
    * still a 2-char substring and the same counting kernel applies
    * unchanged; output pairs are expanded back to their original
    * character spelling. Merge application is literal left-to-right
    * non-overlapping `replace` — identical semantics in the JVM and
    * DuckDB (`"aaa" merge "aa" → [aa, a]`).
    *
    * Scale: every round runs over the VOCABULARY frame (word, freq) —
    * corpus text is scanned once to build it — and each winner is a
    * 1-row broadcast; a full 50k-merge trainer is this loop with the
    * vocabulary kept materialized between rounds.
    */
  private def qBpeIter(s: SparkSession, d: String): DataFrame =
    bpeIter(Tables.documents(s, d))

  private[llm] def bpeIter(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    def pairCounts(df: DataFrame): DataFrame = df
      .filter(char_length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("c"))
      .groupBy(col("pair")).agg(sum(col("c")).as("n"))
    def top1(pc: DataFrame, m: String, n: String): DataFrame =
      pc.orderBy(col("n").desc, col("pair")).limit(1)
        .select(col("pair").as(m), col("n").as(n))
    val t1 = top1(pairCounts(wc), "m1", "n1")
    val wc2 = wc.crossJoin(broadcast(t1))
      .select(expr("replace(w, m1, '')").as("w"), col("c"))
    val t2 = top1(pairCounts(wc2), "m2", "n2")
    val wc3 = wc2.crossJoin(broadcast(t2))
      .select(expr("replace(w, m2, '')").as("w"), col("c"))
    val t3 = top1(pairCounts(wc3), "m3", "n3")
    // Per-round frames unioned (not one 3-way crossJoin): a toy
    // vocabulary can exhaust its pairs before round 3, and an empty
    // later round must not erase the earlier merges — mirroring the
    // oracle's UNION ALL over independently-empty CTEs.
    val r1 = t1.select(lit(1).as("round"), col("m1").as("merge"),
      col("n1").as("n"))
    val r2 = t2.crossJoin(broadcast(t1))
      .select(lit(2).as("round"),
        expr("replace(m2, '', m1)").as("merge"), col("n2").as("n"))
    val r3 = t3.crossJoin(broadcast(t2)).crossJoin(broadcast(t1))
      .select(lit(3).as("round"),
        expr("replace(replace(m3, '', replace(m2, '', m1))," +
          " '', m1)").as("merge"), col("n3").as("n"))
    r1.unionAll(r2).unionAll(r3)
      .select(col("round").cast(IntegerType).as("round"),
        col("merge"), col("n"))
  }

  /** DuckDB pair-count CTE body over vocabulary CTE `src`. */
  private def pairSql(src: String): String =
    s"""SELECT pair, CAST(sum(c) AS BIGINT) AS n FROM (
       |    SELECT unnest(list_transform(range(1, length(w)),
       |      i -> substring(w, i, 2))) AS pair, c
       |    FROM $src WHERE length(w) >= 2) GROUP BY 1""".stripMargin

  private val qBpeIterSql: String =
    s"""WITH w AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents),
       |wc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM w WHERE w <> '' GROUP BY 1),
       |p1 AS (${pairSql("wc")}),
       |t1 AS (SELECT pair AS m1, n AS n1 FROM p1
       |       ORDER BY n DESC, pair LIMIT 1),
       |wc2 AS (SELECT replace(w, (SELECT m1 FROM t1), chr(57344)) AS w, c
       |        FROM wc),
       |p2 AS (${pairSql("wc2")}),
       |t2 AS (SELECT pair AS m2, n AS n2 FROM p2
       |       ORDER BY n DESC, pair LIMIT 1),
       |wc3 AS (SELECT replace(w, (SELECT m2 FROM t2), chr(57345)) AS w, c
       |        FROM wc2),
       |p3 AS (${pairSql("wc3")}),
       |t3 AS (SELECT pair AS m3, n AS n3 FROM p3
       |       ORDER BY n DESC, pair LIMIT 1)
       |SELECT 1 AS round, m1 AS merge, n1 AS n FROM t1
       |UNION ALL
       |SELECT 2, replace(m2, chr(57344), (SELECT m1 FROM t1)), n2 FROM t2
       |UNION ALL
       |SELECT 3, replace(replace(m3, chr(57345),
       |    (SELECT replace(m2, chr(57344), (SELECT m1 FROM t1)) FROM t2)),
       |  chr(57344), (SELECT m1 FROM t1)), n3 FROM t3""".stripMargin

  // ----------------------------------------------------------- q_fertility
  /** Subword-fertility audit per language — tokens-per-word is THE
    * number a tokenizer team watches per language (a fertility of 2×
    * on one language doubles its effective training cost and halves
    * its effective context window). Whitespace words vs the BPE-ish
    * regex segmentation of [[TextAnalysis]]'s token accounting, plus
    * chars-per-subword; ratios ·10⁶ integer-exact. The per-language
    * token/char totals are corpus-scale (~10¹³⁻¹⁴ at 100 TB), so the
    * ·10⁶ numerators route through DECIMAL(38,0)/HUGEINT — a BIGINT
    * product wraps silently past 9.2·10¹². Quotients are ppm-bounded,
    * so the final BIGINT cast is always safe.
    */
  private def qFertility(s: SparkSession, d: String): DataFrame =
    fertility(Tables.documents(s, d))

  private[llm] def fertility(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(lower(col("text")), " ")).cast("long"))
          .as("ws_tokens"),
        sum(regexp_count(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))).as("subword_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("fertility_ppm",
        expr("CAST(subword_tokens AS DECIMAL(38,0)) * 1000000" +
          " div ws_tokens"))
      .withColumn("chars_per_subword_ppm",
        expr("CAST(total_chars AS DECIMAL(38,0)) * 1000000" +
          " div subword_tokens"))

  private val qFertilitySql: String =
    """SELECT *,
      |  CAST(CAST(subword_tokens AS HUGEINT) * 1000000 // ws_tokens
      |       AS BIGINT) AS fertility_ppm,
      |  CAST(CAST(total_chars AS HUGEINT) * 1000000 // subword_tokens
      |       AS BIGINT) AS chars_per_subword_ppm
      |FROM (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
      |      AS ws_tokens,
      |    CAST(SUM(len(regexp_extract_all(lower(text),
      |        '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS subword_tokens,
      |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |  FROM documents GROUP BY lang)""".stripMargin

  // --------------------------------------------------------- q_code_detect
  /** Code-vs-prose gate — web-scale corpora route code and prose to
    * different mixture buckets, and the first-pass router is exactly
    * this: structural-symbol density and digit density per document
    * (braces/brackets/operators are rare in prose, dense in code).
    * Integer ppm ratios; `is_code` at 3% symbol density. Map-only.
    */
  private val CODE_T_PPM = 30000L

  private def qCodeDetect(s: SparkSession, d: String): DataFrame =
    codeDetect(Tables.documents(s, d))

  private[llm] def codeDetect(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        // long from the start: symbol_n * 1000000 in INT wraps silently
        // past ~2147 symbols (non-ANSI), and the oracle is BIGINT.
        regexp_count(col("text"), lit("[{}\\[\\]();=<>#]")).cast("long")
          .as("symbol_n"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("digit_n"),
        col("n_chars"))
      .withColumn("symbol_ppm",
        coalesce(expr("symbol_n * 1000000 div nullif(n_chars, 0)"),
          lit(0L)))
      .withColumn("digit_ppm",
        coalesce(expr("digit_n * 1000000 div nullif(n_chars, 0)"), lit(0L)))
      .withColumn("is_code", col("symbol_ppm") >= CODE_T_PPM)
      .drop("n_chars")

  private val qCodeDetectSql: String =
    s"""SELECT doc_id, symbol_n, digit_n,
       |  coalesce(symbol_n * 1000000 // nullif(n_chars, 0), 0)
       |    AS symbol_ppm,
       |  coalesce(digit_n * 1000000 // nullif(n_chars, 0), 0) AS digit_ppm,
       |  coalesce(symbol_n * 1000000 // nullif(n_chars, 0), 0)
       |    >= $CODE_T_PPM AS is_code
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '[{}\\[\\]();=<>#]'))
       |      AS BIGINT) AS symbol_n,
       |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
       |      AS digit_n,
       |    n_chars
       |  FROM documents)""".stripMargin

  // -------------------------------------------------------- q_substring_dup
  /** Substring-level exact-duplication audit — the signal behind
    * suffix-array dedup of training data (long verbatim spans repeated
    * across documents, invisible to whole-document fingerprints and
    * diluted in shingle-set Jaccard). Winnowing-style fingerprinting
    * (Schleimer et al., MOSS): hash the [[WIN_CHARS]]-codepoint window
    * at EVERY position (O(n) total via the rolling
    * [[graft.functions.RollingHashWindows]] kernel), keep the windows
    * whose hash ≡ 0 mod [[WINNOW_MOD]] — selection is CONTENT-keyed,
    * so a verbatim span selects the same fingerprints in every
    * document that contains it regardless of its offset (a strided /
    * positional sample would only catch copies whose alignment agrees
    * modulo the stride). Mark fingerprints occurring in ≥2 distinct
    * docs and report each doc's duplicated-fingerprint fraction (ppm)
    * with a keep/flag verdict.
    *
    * Scale: fingerprinting is MAP-ONLY and O(n) per doc — text never
    * shuffles, only the ~1/[[WINNOW_MOD]] selected hashes do; the
    * cross-doc count is one hash-keyed agg (single count_distinct —
    * Expand-free) and the per-doc rollup joins fingerprints against
    * the bounded duplicated-hash set.
    */
  private val WIN_CHARS = 32
  private val WINNOW_MOD = 16
  private val DUP_FLAG_PPM = 500000L

  private def qSubstringDup(s: SparkSession, d: String): DataFrame =
    substringDup(Tables.documents(s, d))

  private[graft] def substringDup(docs: DataFrame): DataFrame = {
    graft.functions.RollingHashWindows.register(docs.sparkSession)
    val win = docs.select(col("doc_id"), explode(expr(
      s"filter(rolling_hashes(text, $WIN_CHARS)," +
        s" h -> h % $WINNOW_MOD = 0)")).as("h"))
    val dup = win.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), lit(1).as("is_dup"))
    val per = win.join(dup, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("is_dup"), lit(0)).cast("long")).as("n_dup"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_ppm",
        coalesce(expr("n_dup * 1000000 div nullif(n_windows, 0)"), lit(0L)))
      .withColumn("flagged", col("dup_ppm") >= DUP_FLAG_PPM)
  }

  private val qSubstringDupSql: String =
    s"""WITH win AS (
       |  SELECT doc_id, h FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(
       |        range(1, greatest(length(text) - ${WIN_CHARS - 1}, 0) + 1),
       |        p -> ${Dedup.tokHashSql(s"substring(text, p, $WIN_CHARS)")}))
       |        AS h
       |    FROM documents)
       |  WHERE h % $WINNOW_MOD = 0),
       |dup AS (
       |  SELECT h FROM win GROUP BY h
       |  HAVING count(DISTINCT doc_id) >= 2),
       |per AS (
       |  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       |    CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dup
       |  FROM win w LEFT JOIN dup d ON d.h = w.h
       |  GROUP BY 1)
       |SELECT doc.doc_id,
       |  coalesce(p.n_windows, 0) AS n_windows,
       |  coalesce(p.n_dup, 0) AS n_dup,
       |  coalesce(p.n_dup * 1000000 // nullif(p.n_windows, 0), 0)
       |    AS dup_ppm,
       |  coalesce(p.n_dup * 1000000 // nullif(p.n_windows, 0), 0)
       |    >= $DUP_FLAG_PPM AS flagged
       |FROM documents doc LEFT JOIN per p ON p.doc_id = doc.doc_id""".stripMargin

  // ------------------------------------------------------- q_content_chunks
  /** Content-defined chunking — the storage-dedup splitter (LBFS /
    * backup-tool lineage): a chunk boundary falls after every
    * [[CDC_W]]-codepoint window whose rolling hash ≡ 0 mod [[CDC_M]]
    * (expected chunk ≈ 64 chars), so INSERTIONS shift boundaries only
    * locally — unlike fixed-size blocks, where one inserted byte
    * re-chunks everything downstream. Chunks are then deduplicated by
    * content hash corpus-wide; the output is the storage story: total
    * vs distinct chunk bytes and the dedup ratio in ppm.
    *
    * Scale: chunking is MAP-ONLY array math inside the row (the
    * [[graft.functions.RollingHashWindows]] O(n) codegen pass →
    * boundary filter → span zip); only (hash, size) pairs shuffle,
    * grouped by (h, sz) so a poly-hash collision between
    * different-length chunks cannot make the output order-dependent.
    * `total_bytes` is the full corpus size (10¹⁴ at 100 TB), so the
    * dedup-ratio numerator routes through DECIMAL(38,0)/HUGEINT.
    */
  private val CDC_W = 16
  private val CDC_M = 64

  private def qContentChunks(s: SparkSession, d: String): DataFrame = {
    graft.functions.RollingHashWindows.register(s)
    graft.functions.PolyHash.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .filter(char_length(col("text")) > 0)
      .withColumn("hs", graft.functions.RollingHashWindows
        .rolling_hashes(col("text"), lit(CDC_W)))
      .withColumn("bounds", expr(
        s"array_distinct(concat(array(0), " +
          s"transform(filter(sequence(0, size(hs) - 1)," +
          s" i -> hs[i] % $CDC_M = 0), i -> i + $CDC_W), " +
          "array(char_length(text))))"))
      .select(col("text"), explode(expr(
        "transform(sequence(0, size(bounds) - 2), " +
          "i -> struct(bounds[i] AS st, bounds[i + 1] - bounds[i] AS sz))"))
        .as("sp"))
      .select(expr("poly_hash(substring(text, sp.st + 1, sp.sz))").as("h"),
        col("sp.sz").as("sz"))
      .groupBy(col("h"), col("sz"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("n") * col("sz")).as("total_bytes"),
        sum(col("sz").cast("long")).as("distinct_bytes"))
      .withColumn("dedup_ppm",
        expr("CAST(total_bytes - distinct_bytes AS DECIMAL(38,0))" +
          " * 1000000 div total_bytes"))
  }

  private val qContentChunksSql: String =
    s"""WITH nz AS (
       |  SELECT text FROM documents WHERE length(text) > 0),
       |cb AS (
       |  SELECT text,
       |    list_sort(list_distinct(list_concat(list_concat(
       |      [0],
       |      list_transform(
       |        list_filter(range(1, greatest(length(text) - ${CDC_W - 1}, 0) + 1),
       |          p -> ${Dedup.tokHashSql(s"substring(text, p, $CDC_W)")}
       |            % $CDC_M = 0),
       |        p -> p + ${CDC_W - 1})),
       |      [length(text)]))) AS bounds
       |  FROM nz),
       |spans AS (
       |  SELECT
       |    ${Dedup.tokHashSql(
              "substring(text, bounds[i + 1] + 1, bounds[i + 2] - bounds[i + 1])")}
       |      AS h,
       |    bounds[i + 2] - bounds[i + 1] AS sz
       |  FROM (SELECT text, bounds, unnest(range(len(bounds) - 1)) AS i
       |        FROM cb)),
       |byh AS (
       |  SELECT h, sz, CAST(count(*) AS BIGINT) AS n
       |  FROM spans GROUP BY 1, 2)
       |SELECT CAST(sum(n) AS BIGINT) AS n_chunks,
       |  CAST(count(*) AS BIGINT) AS n_distinct_chunks,
       |  CAST(sum(n * sz) AS BIGINT) AS total_bytes,
       |  CAST(sum(sz) AS BIGINT) AS distinct_bytes,
       |  CAST(CAST(CAST(sum(n * sz) AS BIGINT) - CAST(sum(sz) AS BIGINT)
       |            AS HUGEINT) * 1000000
       |    // CAST(sum(n * sz) AS BIGINT) AS BIGINT) AS dedup_ppm
       |FROM byh""".stripMargin

  // ------------------------------------------------------------ q_bpe_apply
  /** Tokenizer EVALUATION — the other half of the [[qBpeIter]]
    * lifecycle: merges trained on the TRAIN split (doc_id mod 10 < 8,
    * the same 3-round count → winner → rewrite loop) are applied in
    * training order to the HELD-OUT split's vocabulary, measuring the
    * total symbol count after each round and the compression ratio vs
    * raw characters (integer ppm). This is the generalization check a
    * tokenizer release runs: merges earn their vocabulary slots by
    * compressing text they were NOT trained on. (Deliberately
    * re-derives the training chain rather than sharing [[bpeIter]]'s
    * internals: apply needs the RAW private-use-area merge symbols the
    * audit query expands away.)
    *
    * Scale: training runs over the train split's (word, freq) frame;
    * application is three broadcast-1-row rewrites of the held-out
    * vocabulary. The two split vocabularies are '''persisted'''
    * (vocabulary-sized, not corpus-sized): each feeds several
    * pair-count / rewrite branches, and relying on exchange reuse to
    * dedupe them left the corpus tokenize pass re-running per branch
    * on cold runs — persisting pins the one-scan-per-split shape.
    * Everything downstream of the vocab frames is vocabulary-sized.
    */
  private def qBpeApply(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    def vocab(df: DataFrame): DataFrame = df
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairCounts(df: DataFrame): DataFrame = df
      .filter(char_length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("c"))
      .groupBy(col("pair")).agg(sum(col("c")).as("n"))
    def top1(pc: DataFrame, m: String): DataFrame =
      pc.orderBy(col("n").desc, col("pair")).limit(1)
        .select(col("pair").as(m))
    val wc = vocab(docs.filter(col("doc_id") % 10 < 8))
    val t1 = top1(pairCounts(wc), "m1")
    val wc2 = wc.crossJoin(broadcast(t1))
      .select(expr("replace(w, m1, '')").as("w"), col("c"))
    val t2 = top1(pairCounts(wc2), "m2")
    val wc3 = wc2.crossJoin(broadcast(t2))
      .select(expr("replace(w, m2, '')").as("w"), col("c"))
    val t3 = top1(pairCounts(wc3), "m3")
    val ho = vocab(docs.filter(col("doc_id") % 10 >= 8))
    val ho1 = ho.crossJoin(broadcast(t1))
      .select(expr("replace(w, m1, '')").as("w"), col("c"))
    val ho2 = ho1.crossJoin(broadcast(t2))
      .select(expr("replace(w, m2, '')").as("w"), col("c"))
    val ho3 = ho2.crossJoin(broadcast(t3))
      .select(expr("replace(w, m3, '')").as("w"), col("c"))
    def symbols(df: DataFrame, r: Int): DataFrame =
      df.agg(sum(col("c") * char_length(col("w"))).as("n_symbols"))
        .select(lit(r).cast(IntegerType).as("round"), col("n_symbols"))
    val r0 = symbols(ho, 0)
    r0.unionAll(symbols(ho1, 1))
      .unionAll(symbols(ho2, 2))
      .unionAll(symbols(ho3, 3))
      .crossJoin(broadcast(r0.select(col("n_symbols").as("base"))))
      .select(col("round"), col("n_symbols"),
        // holdout symbol counts are corpus-scale → DECIMAL(38,0)
        expr("CAST(n_symbols AS DECIMAL(38,0)) * 1000000 div base")
          .as("ratio_ppm"))
  }

  private val qBpeApplySql: String =
    s"""WITH wtr AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents WHERE doc_id % 10 < 8),
       |wc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM wtr WHERE w <> '' GROUP BY 1),
       |p1 AS (${pairSql("wc")}),
       |t1 AS (SELECT pair AS m1 FROM p1 ORDER BY n DESC, pair LIMIT 1),
       |wc2 AS (SELECT replace(w, (SELECT m1 FROM t1), chr(57344)) AS w, c
       |        FROM wc),
       |p2 AS (${pairSql("wc2")}),
       |t2 AS (SELECT pair AS m2 FROM p2 ORDER BY n DESC, pair LIMIT 1),
       |wc3 AS (SELECT replace(w, (SELECT m2 FROM t2), chr(57345)) AS w, c
       |        FROM wc2),
       |p3 AS (${pairSql("wc3")}),
       |t3 AS (SELECT pair AS m3 FROM p3 ORDER BY n DESC, pair LIMIT 1),
       |who AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents WHERE doc_id % 10 >= 8),
       |ho AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM who WHERE w <> '' GROUP BY 1),
       |ho1 AS (SELECT replace(w, (SELECT m1 FROM t1), chr(57344)) AS w, c
       |        FROM ho),
       |ho2 AS (SELECT replace(w, (SELECT m2 FROM t2), chr(57345)) AS w, c
       |        FROM ho1),
       |ho3 AS (SELECT replace(w, (SELECT m3 FROM t3), chr(57346)) AS w, c
       |        FROM ho2),
       |r AS (
       |  SELECT 0 AS round,
       |    CAST(sum(c * length(w)) AS BIGINT) AS n_symbols FROM ho
       |  UNION ALL SELECT 1, CAST(sum(c * length(w)) AS BIGINT) FROM ho1
       |  UNION ALL SELECT 2, CAST(sum(c * length(w)) AS BIGINT) FROM ho2
       |  UNION ALL SELECT 3, CAST(sum(c * length(w)) AS BIGINT) FROM ho3)
       |SELECT CAST(round AS INTEGER) AS round, n_symbols,
       |  CAST(CAST(n_symbols AS HUGEINT) * 1000000
       |    // (SELECT n_symbols FROM r WHERE round = 0) AS BIGINT)
       |    AS ratio_ppm
       |FROM r""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_merge"     -> qBpeMerge _,
    "q_bpe_iter"      -> qBpeIter _,
    "q_bpe_apply"     -> qBpeApply _,
    "q_content_chunks" -> qContentChunks _,
    "q_fertility"     -> qFertility _,
    "q_code_detect"   -> qCodeDetect _,
    "q_substring_dup" -> qSubstringDup _
  )

  val oracles: Map[String, String] = Map(
    "q_bpe_merge"     -> qBpeMergeSql,
    "q_bpe_iter"      -> qBpeIterSql,
    "q_bpe_apply"     -> qBpeApplySql,
    "q_content_chunks" -> qContentChunksSql,
    "q_fertility"     -> qFertilitySql,
    "q_code_detect"   -> qCodeDetectSql,
    "q_substring_dup" -> qSubstringDupSql
  )
}
