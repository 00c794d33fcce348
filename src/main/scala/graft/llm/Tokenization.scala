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

  // -------------------------------------------------------- q_substring_dup
  /** Substring-level exact-duplication audit — the signal behind
    * suffix-array dedup of training data (long verbatim spans repeated
    * across documents, invisible to whole-document fingerprints and
    * diluted in shingle-set Jaccard): hash a [[WIN_CHARS]]-char window
    * at every [[WIN_STRIDE]]-char position of each doc, mark windows
    * whose hash occurs in ≥2 DISTINCT docs, and report each doc's
    * duplicated-window fraction (ppm) with a keep/flag verdict. The
    * stride trades recall for cost exactly like suffix-array sampling;
    * stride ≤ window/2 still catches any duplicated span ≥ 2·window.
    *
    * Scale: window hashing is MAP-ONLY (fixed-width md5 per position —
    * text never shuffles, hashes do); the cross-doc count is one hash-
    * keyed agg (single count_distinct — Expand-free) and the per-doc
    * rollup joins windows against the bounded duplicated-hash set.
    */
  private val WIN_CHARS = 32
  private val WIN_STRIDE = 16
  private val DUP_FLAG_PPM = 500000L

  private def qSubstringDup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val win = docs.select(col("doc_id"), explode(expr(
      s"""CASE WHEN char_length(text) >= $WIN_CHARS THEN
         |  transform(sequence(1, char_length(text) - ${WIN_CHARS - 1},
         |                     $WIN_STRIDE),
         |            p -> md5(substring(text, p, $WIN_CHARS)))
         |ELSE array() END""".stripMargin)).as("h"))
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
       |  SELECT doc_id,
       |    unnest(list_transform(
       |      range(1, greatest(length(text) - ${WIN_CHARS - 1}, 0) + 1,
       |            $WIN_STRIDE),
       |      p -> md5(substring(text, p, $WIN_CHARS)))) AS h
       |  FROM documents),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_merge"     -> qBpeMerge _,
    "q_substring_dup" -> qSubstringDup _
  )

  val oracles: Map[String, String] = Map(
    "q_bpe_merge"     -> qBpeMergeSql,
    "q_substring_dup" -> qSubstringDupSql
  )
}
