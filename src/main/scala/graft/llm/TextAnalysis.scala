package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language ID, fingerprinting.
  *
  * Everything is per-row narrow work (map-only, no shuffle except the
  * final aggregations) built from codegen'd built-ins — at 100 TB these
  * scan linearly with zero exchange, the ideal shape for corpus
  * filtering.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Canonical fingerprint: lowercase, strip non-alphanumerics,
    * collapse runs of spaces, md5. The rolling-hash document
    * fingerprint of the dedup literature, on md5 for cross-engine
    * determinism.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))

  private val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  // ----------------------------------------------------------- q_text_stats
  /** Per-document quality statistics: token counts, uniqueness, average
    * token length, stopword ratio.
    */
  private def qTextStats(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("n_chars"),
        size(t).cast(IntegerType).as("n_tokens"),
        size(array_distinct(t)).cast(IntegerType).as("n_uniq_tokens"),
        (length(col("text")).cast("double") / size(t)).as("avg_token_span"),
        size(filter(t, x => x.isInCollection(stopwords)))
          .cast(IntegerType).as("n_stopwords"),
        (size(filter(t, x => x.isInCollection(stopwords))).cast("double")
          / size(t)).as("stopword_ratio")
      )
  }

  private val qTextStatsSql: String = {
    val sw = stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, n_chars,
       |  CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
       |  CAST(len(list_distinct(string_split(lower(text), ' '))) AS INTEGER)
       |    AS n_uniq_tokens,
       |  CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' '))
       |    AS avg_token_span,
       |  CAST(len(list_filter(string_split(lower(text), ' '),
       |                       x -> x IN ($sw))) AS INTEGER) AS n_stopwords,
       |  CAST(len(list_filter(string_split(lower(text), ' '),
       |                       x -> x IN ($sw))) AS DOUBLE)
       |    / len(string_split(lower(text), ' ')) AS stopword_ratio
       |FROM documents""".stripMargin
  }

  // ------------------------------------------------------------- q_lang_id
  /** Marker-token language ID: score each candidate language by marker
    * hits, argmax with a deterministic tie-break on language name. A
    * real n-gram profile model has the same plan shape (map-side score,
    * no shuffle).
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "das"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "les", "des"),
    "zh" -> Seq("zh0", "zh1", "zh2") // synthetic corpus has no hanzi
  )

  private def qLangId(s: SparkSession, d: String): DataFrame = {
    val t = tokens(col("text"))
    // argmax encoded as a sortable "zero-padded-score|lang" string:
    // max = highest score, ties broken by lang name descending —
    // identical greatest(VARCHAR) semantics on both engines.
    val scored = langMarkers.map { case (lang, markers) =>
      concat(
        lpad(size(filter(t, x => x.isInCollection(markers)))
          .cast("string"), 6, "0"),
        lit("|" + lang))
    }
    val best = greatest(scored: _*)
    Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("lang").as("true_lang"),
        substring(best, 8, 8).as("pred_lang"),
        substring(best, 1, 6).cast(IntegerType).as("pred_score")
      )
  }

  private val qLangIdSql: String = {
    val scored = langMarkers.map { case (lang, markers) =>
      val sw = markers.map(w => s"'$w'").mkString(", ")
      s"lpad(CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ($sw))) AS VARCHAR), 6, '0') || '|$lang'"
    }.mkString(",\n    ")
    s"""SELECT doc_id, lang AS true_lang,
       |  substring(greatest($scored), 8, 8) AS pred_lang,
       |  CAST(substring(greatest($scored), 1, 6) AS INTEGER) AS pred_score
       |FROM documents""".stripMargin
  }

  // ----------------------------------------------------------- q_oov_rate
  /** Out-of-vocabulary rate per source — the vocabulary-coverage audit
    * run before committing a tokenizer: the share of token
    * OCCURRENCES falling outside the corpus top-[[OOV_VOCAB]]
    * vocabulary (by count, ties to term for determinism), as integer
    * ppm per source. A source with a high OOV rate either needs a
    * bigger vocab, byte-fallback tokenization, or is noise.
    *
    * Scale: the vocabulary is one token agg + a bounded top-K
    * (TakeOrderedAndProject) → '''broadcast''' into a left-semi-style
    * membership flag on the token stream; the per-source rollup has
    * |sources| groups. Two corpus passes (vocab build, scoring), both
    * map-collapsed.
    */
  private val OOV_VOCAB = 20

  private def qOovRate(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val vocab = tok.groupBy(col("term"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(OOV_VOCAB)
      .select(col("term"), lit(1L).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("term"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      // per-source token counts are corpus-scale (10¹³⁺ at 100 TB) —
      // the ·10⁶ numerator routes through DECIMAL(38,0)/HUGEINT
      .withColumn("oov_ppm",
        expr("CAST(n_oov AS DECIMAL(38,0)) * 1000000 div n_tokens"))
  }

  private val qOovRateSql: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents),
       |tk AS (SELECT source, term FROM tok WHERE term <> ''),
       |vocab AS (
       |  SELECT term FROM (
       |    SELECT term, count(*) AS c FROM tk GROUP BY 1
       |    ORDER BY c DESC, term LIMIT $OOV_VOCAB))
       |SELECT tk.source,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_oov,
       |  CAST(CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
       |            AS HUGEINT)
       |    * 1000000 // CAST(count(*) AS BIGINT) AS BIGINT) AS oov_ppm
       |FROM tk LEFT JOIN vocab v ON v.term = tk.term
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------- q_langid_confusion
  /** Language-label quality audit — the confusion matrix between the
    * DECLARED `lang` label and [[qLangId]]'s heuristic prediction,
    * with per-true-lang recall in integer ppm. On a scraped corpus
    * the declared label is often wrong; this is the audit that
    * decides whether to trust metadata or re-classify (and, run per
    * source, which feeds are mislabeled).
    *
    * Scale: the per-doc prediction is map-only (qLangId's shape); the
    * matrix agg has ≤ langs² groups so partials collapse map-side,
    * and the per-true-lang totals derive from the matrix itself
    * (never a second corpus pass) and '''broadcast''' into the recall
    * join.
    */
  private def qLangidConfusion(s: SparkSession, d: String): DataFrame = {
    val cm = qLangId(s, d)
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val tot = cm.groupBy(col("true_lang")).agg(sum(col("n")).as("n_true"))
    cm.join(broadcast(tot), Seq("true_lang"))
      .select(col("true_lang"), col("pred_lang"), col("n"),
        expr("n * 1000000 div n_true").as("recall_ppm"))
  }

  private val qLangidConfusionSql: String =
    s"""WITH pred AS ($qLangIdSql),
       |cm AS (
       |  SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |  FROM pred GROUP BY 1, 2),
       |tot AS (
       |  SELECT true_lang, CAST(sum(n) AS BIGINT) AS n_true
       |  FROM cm GROUP BY 1)
       |SELECT cm.true_lang, cm.pred_lang, cm.n,
       |  cm.n * 1000000 // tot.n_true AS recall_ppm
       |FROM cm JOIN tot ON tot.true_lang = cm.true_lang""".stripMargin

  // --------------------------------------------------------- q_token_count
  /** Corpus token accounting per source: whitespace tokens and a
    * BPE-ish regex token count (letter runs / digit runs / other).
    */
  private def qTokenCount(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text")))).as("ws_tokens"),
        sum(regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")))
          .as("bpe_ish_tokens"),
        sum(col("n_chars")).as("total_chars")
      )

  private val qTokenCountSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(lower(text),
      |      '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS bpe_ish_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY source""".stripMargin

  // -------------------------------------------------------- q_fingerprint
  /** Canonical-form fingerprint per document (md5 of normalized text) —
    * the map side of exact dedup.
    */
  private def qFingerprint(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))

  private val qFingerprintSql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin

  // --------------------------------------------------------------- q_chunk
  /** Fixed-size context chunking: split each document into 64-char
    * chunks with position index and per-chunk md5 — the map-only
    * pre-processing step that feeds context windows to a trainer.
    * The chunk array is built lazily per row (sequence + substr inside
    * codegen) and exploded; no shuffle, output size ≈ corpus size.
    */
  private val CHUNK = 64

  private def qChunk(s: SparkSession, d: String): DataFrame = {
    val nc = greatest(
      expr(s"(length(text) - 1) div $CHUNK") + 1, lit(1))
    Tables
      .documents(s, d)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nc - 1),
          i => col("text").substr(i * CHUNK + 1, lit(CHUNK))))
          .as(Seq("pos", "chunk")))
      .select(
        col("doc_id"), col("pos"),
        length(col("chunk")).cast(IntegerType).as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
  }

  private val qChunkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    greatest((length(text) - 1) // $CHUNK + 1, 1) AS nc
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    CAST(unnest(range(nc)) AS INTEGER) AS pos,
       |    unnest(list_transform(range(nc),
       |      i -> substring(text, CAST(i * $CHUNK + 1 AS INTEGER), $CHUNK)))
       |      AS chunk
       |  FROM t)
       |SELECT doc_id, pos,
       |  CAST(length(chunk) AS INTEGER) AS chunk_len,
       |  md5(chunk) AS chunk_md5
       |FROM c""".stripMargin

  // -------------------------------------------------------------- q_curate
  /** End-to-end corpus curation pass — the composition a training-data
    * pipeline actually runs:
    *  1. exact dedup to one canonical copy per fingerprint (cheap, so
    *     it runs first and shrinks the fuzzy stage's input);
    *  2. MinHash near-dup removal over the survivors — band-blocked
    *     candidates, exact shingle-Jaccard verify, keep only cluster
    *     canonicals ([[graft.llm.Dedup.canonicalMap]]);
    *  3. quality gates on token count and stopword ratio.
    * Plan: the exact-dedup aggregation carries (fp, min_id), the fuzzy
    * stage carries (id, id) pairs and K-long signatures — no shuffle
    * ever carries document text, which is what keeps the composition
    * viable at 100 TB.
    */
  private def qCurate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // Exact dedup: smallest doc_id per fingerprint. Only the ID
    // survives this stage — the fuzzy stage's shingle sets and
    // signatures come from the session memos (per-document frames,
    // subsettable by semi-join), so no stage downstream ever needs
    // the survivor text and the corpus is scanned once across the
    // whole dedup family (canonicalMapSharedSubset's scaladoc).
    val survivorIds = docs
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val fuzzyCanonical = Dedup.canonicalMapSharedSubset(s, d, survivorIds)
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"))
    val t = tokens(col("text"))
    docs
      .join(fuzzyCanonical, Seq("doc_id"), "left_semi")
      .select(
        col("doc_id"), col("lang"), col("source"),
        size(t).cast(IntegerType).as("n_tokens"),
        (size(filter(t, x => x.isInCollection(stopwords))).cast("double")
          / size(t)).as("stopword_ratio"))
      .filter(col("n_tokens").between(10, 2000) &&
        col("stopword_ratio") < 0.5)
  }

  private lazy val qCurateSql: String = {
    val sw = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH exact_canonical AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM documents
       |  GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text),
       |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))),
       |survivors AS (
       |  SELECT * FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM exact_canonical)),
       |${Dedup.canonicalSqlWith("survivors")},
       |scored AS (
       |  SELECT doc_id, lang, source,
       |    CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
       |    CAST(len(list_filter(string_split(lower(text), ' '),
       |                         x -> x IN ($sw))) AS DOUBLE)
       |      / len(string_split(lower(text), ' ')) AS stopword_ratio
       |  FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM canon
       |                   WHERE doc_id = canonical_id))
       |SELECT doc_id, lang, source, n_tokens, stopword_ratio
       |FROM scored
       |WHERE n_tokens BETWEEN 10 AND 2000 AND stopword_ratio < 0.5""".stripMargin
  }

  // --------------------------------------------------------------- q_split
  /** Deterministic train/val/test carve by content-independent hash:
    * md5 of the doc id mod 100 → 80/10/10. Stable across engines,
    * partitionings, reruns and data growth (a doc never changes split
    * when the corpus around it does) — the reproducible way to carve
    * held-out shards; rand()/TABLESAMPLE are neither. Map-only.
    */
  private def qSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % 100
    Tables
      .documents(s, d)
      .select(col("doc_id"), col("lang"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
  }

  private val qSplitSql: String =
    """SELECT doc_id, lang,
      |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |            AS BIGINT) % 100 < 80 THEN 'train'
      |       WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |            AS BIGINT) % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin

  // ------------------------------------------------------------- q_leakage
  /** Split-leakage audit — after carving train/val/test ([[qSplit]]'s
    * hash rule), count how many eval documents share an exact content
    * fingerprint with ANY train document: the contamination check a
    * release pipeline runs on its own split (the intra-corpus
    * complement of `q_contamination`, which audits against an
    * EXTERNAL benchmark). Output: per split, total docs and docs
    * whose content also appears in train.
    *
    * Scale: fingerprints are md5 (map-side); the train fingerprint
    * set arrives via a LEFT SEMI join keyed on the fingerprint —
    * shuffle carries (fp) only, never text; the verdict is one
    * split-keyed aggregation. Exact-dup leakage only by design —
    * NEAR-dup leakage composes the same audit with the MinHash band
    * machinery (join through `bandCandidates` instead of equal fps).
    */
  private def qLeakage(s: SparkSession, d: String): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % 100
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
    val trainFps = docs.filter(col("split") === "train")
      .select(col("fp")).distinct()
    val leaked = docs.filter(col("split") =!= "train")
      .join(trainFps, Seq("fp"), "left_semi")
      .groupBy(col("split")).agg(count(lit(1)).as("n_leaked"))
    docs.filter(col("split") =!= "train")
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      .join(leaked, Seq("split"), "left")
      .select(col("split"), col("n_docs"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"),
        (coalesce(col("n_leaked"), lit(0L)).cast("double")
          / col("n_docs")).as("leak_frac"))
  }

  private val qLeakageSql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
      |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |              AS BIGINT) % 100 < 80 THEN 'train'
      |         WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |              AS BIGINT) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |tr AS (SELECT DISTINCT fp FROM docs WHERE split = 'train'),
      |ev AS (SELECT * FROM docs WHERE split <> 'train'),
      |lk AS (
      |  SELECT split, CAST(count(*) AS BIGINT) AS n_leaked
      |  FROM ev WHERE fp IN (SELECT fp FROM tr) GROUP BY 1),
      |tot AS (
      |  SELECT split, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM ev GROUP BY 1)
      |SELECT t.split, t.n_docs,
      |  coalesce(l.n_leaked, 0) AS n_leaked,
      |  CAST(coalesce(l.n_leaked, 0) AS DOUBLE) / t.n_docs AS leak_frac
      |FROM tot t LEFT JOIN lk l ON l.split = t.split""".stripMargin

  // ---------------------------------------------------------------- q_pack
  /** Token-budget packing: fill context windows of `PACK_BUDGET`
    * whitespace tokens by running a prefix sum over a deterministic
    * doc order and cutting a new bin each time the budget is crossed
    * (streaming fill — the standard approximation of bin packing a
    * trainer's data loader uses).
    *
    * Scale: the window partition key is (lang, shard) with shard =
    * hash mod [[PACK_SHARDS]] — NOT bare lang, whose fixed cardinality
    * would put a whole language's running sum on one task at 100 TB.
    * Shard count scales with the cluster; each window partition stays
    * bounded.
    */
  private val PACK_BUDGET = 2048
  private val PACK_SHARDS = 4

  private def qPack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % PACK_SHARDS
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables
      .documents(s, d)
      .select(col("doc_id"), col("lang"), shard.as("shard"),
        size(tokens(col("text"))).cast(IntegerType).as("n_tokens"))
      .withColumn("prefix_tokens",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"prefix_tokens div $PACK_BUDGET"))
  }

  private val qPackSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
       |         AS BIGINT) % $PACK_SHARDS AS shard,
       |    CAST(len(string_split(lower(text), ' ')) AS INTEGER)
       |      AS n_tokens
       |  FROM documents)
       |SELECT doc_id, lang, shard, n_tokens,
       |  CAST(COALESCE(SUM(n_tokens) OVER (
       |    PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS prefix_tokens,
       |  CAST(COALESCE(SUM(n_tokens) OVER (
       |    PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // $PACK_BUDGET AS BIGINT) AS bin
       |FROM t""".stripMargin

  // --------------------------------------------------------------- q_vocab
  /** Vocabulary extraction: top-50 corpus tokens by term frequency
    * with document frequency — the tokenizer-training precursor.
    * Plan: explode → one hash aggregation (map-side partials carry
    * (token, count) pairs, never documents) → TakeOrderedAndProject
    * for the top-k (no global sort). Ties break on the token itself
    * for cross-engine determinism.
    */
  private val VOCAB_K = 50

  private def qVocab(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(VOCAB_K)

  private val qVocabSql: String =
    s"""SELECT t AS token, count(*) AS tf, count(DISTINCT doc_id) AS df
       |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
       |      FROM documents)
       |GROUP BY t
       |ORDER BY tf DESC, t
       |LIMIT $VOCAB_K""".stripMargin

  // ------------------------------------------------------- q_readability
  /** Readability ratios per document — the Flesch-style signal with
    * the floats stripped out: words-per-sentence and
    * syllables-per-word (vowel-group proxy — the standard
    * dictionary-free approximation) as integer ppm, plus a banded
    * easy/medium/hard grade from integer thresholds. Complexity
    * grading feeds curriculum ordering and audience routing; the
    * ppm ratios keep every boundary decision bit-identical across
    * engines where the classic 206.835 − 1.015x − 84.6y formula
    * would hinge on float rounding.
    *
    * Scale: map-only — three codegen'd regex/array passes per row,
    * zero shuffle (the q_redact shape).
    */
  private def qReadability(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("size(filter(split(lower(text), ' '), x -> x != ''))")
          .cast("long").as("n_words"),
        greatest(expr("CAST(regexp_count(text, '[.!?]+') AS BIGINT)"),
          lit(1L)).as("n_sentences"),
        expr("CAST(regexp_count(lower(text), '[aeiouy]+') AS BIGINT)")
          .as("n_syllables"))
      .withColumn("wps_ppm", expr("n_words * 1000000 div n_sentences"))
      .withColumn("spw_ppm",
        expr("coalesce(n_syllables * 1000000 div nullif(n_words, 0), 0)"))
      .withColumn("grade",
        when(col("spw_ppm") > 1900000L || col("wps_ppm") > 25000000L,
          lit("hard"))
          .when(col("spw_ppm") > 1500000L || col("wps_ppm") > 17000000L,
            lit("medium"))
          .otherwise(lit("easy")))

  private val qReadabilitySql: String =
    """SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CAST(n_words * 1000000 // n_sentences AS BIGINT) AS wps_ppm,
      |  CAST(coalesce(n_syllables * 1000000 // nullif(n_words, 0), 0)
      |       AS BIGINT) AS spw_ppm,
      |  CASE WHEN coalesce(n_syllables * 1000000 // nullif(n_words, 0), 0)
      |              > 1900000
      |         OR n_words * 1000000 // n_sentences > 25000000 THEN 'hard'
      |       WHEN coalesce(n_syllables * 1000000 // nullif(n_words, 0), 0)
      |              > 1500000
      |         OR n_words * 1000000 // n_sentences > 17000000 THEN 'medium'
      |       ELSE 'easy' END AS grade
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(lower(text), ' '),
      |      x -> x <> '')) AS BIGINT) AS n_words,
      |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT), 1) AS n_sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS n_syllables
      |  FROM documents)""".stripMargin

  // --------------------------------------------------------------- q_zipf
  /** Zipf diagnostic — rank × frequency over the top-50 vocabulary:
    * Zipf's law predicts rank·freq ≈ constant, so the `zipf_ppm`
    * column (rank·freq normalized to the top token's frequency)
    * should stay near 10⁶ on natural text and collapse on templated
    * or synthetic corpora — the log-log-slope check without logs,
    * and the one-glance "is this corpus natural language" audit.
    *
    * Scale: one vocabulary aggregation (token-keyed, map-side
    * partials) + a top-50 TakeOrderedAndProject; the ranked frame is
    * 50 rows, everything derived from it is driver-free arithmetic.
    */
  private def qZipf(s: SparkSession, d: String): DataFrame = {
    val top = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token")).limit(50)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("tf").desc, col("token"))).cast(IntegerType))
      .withColumn("tf1", max(when(col("rank") === 1, col("tf"))).over(
        Window.partitionBy()))
      .select(col("rank"), col("token"), col("tf"),
        expr("rank * tf").as("rank_x_freq"),
        // rank·tf·10⁶ crosses int64 once tf passes ~2·10¹¹ → decimal
        expr("CAST(rank AS DECIMAL(38,0)) * tf * 1000000 div tf1")
          .as("zipf_ppm"))
  }

  private val qZipfSql: String =
    """WITH v AS (
      |  SELECT t AS token, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS t
      |        FROM documents)
      |  WHERE t <> '' GROUP BY 1
      |  ORDER BY tf DESC, token LIMIT 50),
      |r AS (
      |  SELECT token, tf,
      |    CAST(row_number() OVER (ORDER BY tf DESC, token) AS INTEGER)
      |      AS rank
      |  FROM v)
      |SELECT rank, token, tf,
      |  CAST(rank * tf AS BIGINT) AS rank_x_freq,
      |  CAST(CAST(rank AS HUGEINT) * tf * 1000000 //
      |    (SELECT max(CASE WHEN rank = 1 THEN tf END) FROM r) AS BIGINT)
      |    AS zipf_ppm
      |FROM r""".stripMargin

  // ----------------------------------------------------- q_vocab_coverage
  /** Vocabulary coverage curve — the vocab-SIZING audit ([[qVocab]]
    * extracts the vocabulary, `q_oov_rate` audits one fixed cutoff;
    * this sweeps the cutoff): what fraction of all token occurrences
    * the top-K vocabulary covers, at K ∈ {100, 500, 2000}. The knee of
    * this curve is where a tokenizer stops earning coverage per slot —
    * the number a vocab-size decision actually needs.
    *
    * Scale: one corpus pass to the (token, tf) frame; each cutoff is a
    * TakeOrderedAndProject top-K over the vocabulary frame followed by
    * a K-row sum — never a corpus-wide rank. The repeated vocabulary
    * agg is an identical subplan across branches (runtime exchange
    * reuse dedupes it).
    */
  private val COVERAGE_KS = Seq(100, 500, 2000)

  private def qVocabCoverage(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    def cov(k: Int): DataFrame = tf
      .orderBy(col("tf").desc, col("token").asc).limit(k)
      .agg(sum(col("tf")).as("top_tokens"))
      .select(lit(k).cast(IntegerType).as("k"), col("top_tokens"))
    COVERAGE_KS.map(cov).reduce(_ unionAll _)
      .crossJoin(broadcast(tf.agg(sum(col("tf")).as("total_tokens"))))
      .select(col("k"), col("top_tokens"), col("total_tokens"),
        // top_tokens approaches the corpus token count → decimal
        expr("CAST(top_tokens AS DECIMAL(38,0)) * 1000000" +
          " div total_tokens").as("coverage_ppm"))
  }

  private val qVocabCoverageSql: String = {
    val branches = COVERAGE_KS.map(k =>
      s"""SELECT $k AS k,
         |    CAST(sum(CASE WHEN r <= $k THEN tf END) AS BIGINT)
         |      AS top_tokens FROM rk""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH tf AS (
       |  SELECT t AS token, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS t
       |        FROM documents)
       |  GROUP BY 1),
       |rk AS (
       |  SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS r
       |  FROM tf),
       |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total_tokens FROM tf),
       |ks AS (
       |  $branches)
       |SELECT CAST(k AS INTEGER) AS k, top_tokens, total_tokens,
       |  CAST(CAST(top_tokens AS HUGEINT) * 1000000 // total_tokens
       |       AS BIGINT) AS coverage_ppm
       |FROM ks, tot""".stripMargin
  }

  // ----------------------------------------------------- q_weighted_sample
  /** Weighted sampling without replacement — priority sampling
    * (Duffield–Lund–Thorup): each doc gets priority u/w where u is a
    * hash-derived uniform and w its weight (here `n_chars`); the k
    * smallest priorities are the sample, so inclusion probability
    * scales with weight. Deterministic AND cross-engine exact: u =
    * (h+1)/2³² from a 32-bit md5 prefix is an exact double (division
    * by a power of two), and the single u/w division is correctly
    * rounded identically by every IEEE engine — this is the ln-free
    * construction (exponential keys u^(1/w) would differ in the last
    * ulp across libm implementations).
    *
    * Scale: map-only priority + global top-k → Spark plans
    * `TakeOrderedAndProject` (per-partition k, then k·partitions at
    * the driver) — no global sort, no single-partition window.
    */
  private def qWeightedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // w = 0 would make priority NULL, and Spark (NULLS FIRST asc) and
      // DuckDB (NULLS LAST) order those differently — zero-weight rows
      // are excluded from the draw on both engines instead.
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        ((conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").cast("double") + 1) / 4294967296.0 / col("n_chars"))
          .as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(100)

  private val qWeightedSampleSql: String =
    """WITH pr AS (
      |  SELECT doc_id, n_chars,
      |    (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |               AS BIGINT) AS DOUBLE) + 1)
      |      / 4294967296.0 / n_chars AS priority
      |  FROM documents WHERE n_chars > 0)
      |SELECT doc_id, n_chars, priority
      |FROM pr ORDER BY priority, doc_id LIMIT 100""".stripMargin

  // ------------------------------------------------------- q_contamination
  /** Benchmark decontamination — the train/test overlap check every
    * training-data pipeline runs before shipping a corpus: flag corpus
    * documents sharing word 3-grams with a held-out benchmark set
    * (here: `doc_id % 50 == 0`, the deterministic stand-in for an eval
    * suite).
    *
    * Scale: grams are md5-prefix-hashed to BIGINT before any shuffle
    * (8 bytes, not text), deduped per document, and the benchmark gram
    * set — small by construction, an eval suite is MBs while the corpus
    * is TBs — is '''broadcast''' into a left join, so the corpus side
    * streams. The deduped gram frame feeds both the benchmark branch
    * and the corpus branch, so it is persisted — without it the
    * tokenize→hash→distinct subtree (the expensive part) executes
    * twice, once per branch. Exchanges: the gram distinct and the
    * per-doc count agg.
    * Collision note: dedup and membership are both on the hash, on both
    * engines, so a collision changes both sides identically.
    */
  private def qContamination(s: SparkSession, d: String): DataFrame = {
    val n = 3
    val docs = Tables.documents(s, d)
    val dg = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(tk) - $n), " +
          s"i -> array_join(slice(tk, i + 1, $n), ' '))")).as("g"))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long").as("gh"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = dg.filter(col("doc_id") % 50 === 0)
      .select(col("gh")).distinct()
    dg.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_grams"))
          .as("contamination_rate"),
        (col("n_hit") * 2 >= col("n_grams")).as("contaminated"))
  }

  private val qContaminationSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
      |grams AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS gh
      |  FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(len(tk) - 2),
      |        i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))) AS g
      |    FROM tok WHERE len(tk) >= 3)),
      |dg AS (SELECT DISTINCT doc_id, gh FROM grams),
      |bench AS (SELECT DISTINCT gh FROM dg WHERE doc_id % 50 = 0),
      |corpus AS (SELECT doc_id, gh FROM dg WHERE doc_id % 50 <> 0),
      |hits AS (
      |  SELECT c.doc_id,
      |    CAST(count(*) AS BIGINT) AS n_grams,
      |    CAST(count(b.gh) AS BIGINT) AS n_hit
      |  FROM corpus c LEFT JOIN bench b ON c.gh = b.gh
      |  GROUP BY 1)
      |SELECT doc_id, n_grams, n_hit,
      |  CAST(n_hit AS DOUBLE) / n_grams AS contamination_rate,
      |  (n_hit * 2 >= n_grams) AS contaminated
      |FROM hits""".stripMargin

  // --------------------------------------------------------- q_stratified
  /** Deterministic stratified sampling: exactly ⌊n/10⌋ documents per
    * language stratum, picked by content-independent hash order
    * (md5 of the id) — reproducible across engines, partitionings and
    * reruns, unlike rand()/TABLESAMPLE, and exact per-stratum counts
    * unlike Spark's Bernoulli `sampleBy`. The `rn * 10 <= n` integer
    * guard avoids any float fraction. Scale: one exchange on the
    * stratum key; both window passes share it.
    */
  private def qStratified(s: SparkSession, d: String): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(
        byLang.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
      .filter(col("rn") * 10 <= col("n"))
      .select(col("doc_id"), col("lang"), col("rn").cast(IntegerType).as("rn"))
  }

  private val qStratifiedSql: String =
    """WITH r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn
      |FROM r WHERE rn * 10 <= n""".stripMargin

  // -------------------------------------------------------------- q_tfidf
  /** Top-3 characteristic terms per document by an integer-exact
    * tf·idf: score = tf · (N·10⁶ div df). Integer arithmetic
    * throughout — `ln`-based idf differs in the last ulp across
    * engines (see q_split's scaladoc for the same reasoning on pow),
    * and the scaled integer ratio preserves the idf ordering.
    *
    * Scale: tf is one (doc, term) hash agg of the exploded tokens; df
    * is a second agg over tf's output (vocabulary-sized, far smaller);
    * N is a scalar. The df side of the join is vocabulary-sized →
    * '''broadcast'''. The final top-3 is a per-doc window over the tf
    * partitioning.
    */
  private def qTfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = termFreq(docs)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", expr("tf * ((n_docs * 1000000) div df)"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rnk").cast(IntegerType).as("rnk"))
  }

  private val qTfidfSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM tok WHERE term <> '' GROUP BY 1, 2),
      |df AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    CAST(tf.tf * ((n.n_docs * 1000000) // df.df) AS BIGINT) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY score DESC, term) AS rnk
      |  FROM scored)
      |SELECT doc_id, term, tf, df, score, CAST(rnk AS INTEGER) AS rnk
      |FROM rk WHERE rnk <= 3""".stripMargin

  /** (doc_id, term, tf) — exploded-token term frequencies, the shared
    * first stage of q_tfidf / q_repetition / q_bm25 / q_inverted. One
    * (doc, term) hash aggregation with map-side combine; identical
    * plan subtree across the four queries, so a multi-query session
    * over a persisted copy computes it once.
    */
  private def termFreq(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  private val termFreqSql: String =
    """tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM tok WHERE term <> '' GROUP BY 1, 2)""".stripMargin

  // --------------------------------------------------------- q_repetition
  /** Repetition / boilerplate quality signals — the Gopher-style
    * filters a curation pipeline runs alongside [[qTextStats]]:
    * most-frequent-token fraction (catches `foo foo foo ...` spam) and
    * duplicate word-3-gram fraction (catches copy-pasted boilerplate
    * blocks), plus the combined keep/drop verdict.
    *
    * Scale: term counting is the shared [[termFreq]] hash agg; the
    * gram-side stats are pure map work off the token array (the
    * distinct-gram count never leaves its row); the doc-level join is
    * co-partitioned on doc_id. No shuffle carries text.
    */
  private def qRepetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val byDoc = termFreq(docs).groupBy(col("doc_id"))
      .agg(max(col("tf")).as("top_tf"), sum(col("tf")).as("n_tok"))
    val t = tokens(col("text"))
    val gramStats = docs.select(col("doc_id"),
      when(size(t) >= 3, size(t) - 2).otherwise(0)
        .cast("long").as("n_grams"),
      size(Dedup.shingles(col("text"))).cast("long").as("n_uniq_grams"))
    byDoc.join(gramStats, Seq("doc_id"))
      .select(col("doc_id"), col("top_tf"), col("n_tok"),
        (col("top_tf").cast("double") / col("n_tok")).as("top_tok_frac"),
        col("n_grams"), col("n_uniq_grams"),
        when(col("n_grams") > 0,
          lit(1.0) - col("n_uniq_grams").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)).as("dup_gram_frac"))
      .withColumn("flagged",
        (col("top_tok_frac") > 0.2) || (col("dup_gram_frac") > 0.3))
  }

  private val qRepetitionSql: String =
    s"""WITH $termFreqSql,
       |bydoc AS (
       |  SELECT doc_id, max(tf) AS top_tf,
       |    CAST(sum(tf) AS BIGINT) AS n_tok
       |  FROM tf GROUP BY 1),
       |tka AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS tk
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN len(tk) >= 3 THEN len(tk) - 2 ELSE 0 END
       |         AS BIGINT) AS n_grams,
       |    CAST(len(list_distinct(list_transform(range(len(tk) - 2),
       |      i -> array_to_string(tk[i+1:i+3], ' ')))) AS BIGINT)
       |      AS n_uniq_grams
       |  FROM tka)
       |SELECT b.doc_id, b.top_tf, b.n_tok,
       |  CAST(b.top_tf AS DOUBLE) / b.n_tok AS top_tok_frac,
       |  g.n_grams, g.n_uniq_grams,
       |  CASE WHEN g.n_grams > 0
       |       THEN 1.0 - CAST(g.n_uniq_grams AS DOUBLE) / g.n_grams
       |       ELSE 0.0 END AS dup_gram_frac,
       |  (CAST(b.top_tf AS DOUBLE) / b.n_tok > 0.2 OR
       |   CASE WHEN g.n_grams > 0
       |        THEN 1.0 - CAST(g.n_uniq_grams AS DOUBLE) / g.n_grams
       |        ELSE 0.0 END > 0.3) AS flagged
       |FROM bydoc b JOIN grams g USING (doc_id)""".stripMargin

  // --------------------------------------------------------------- q_bm25
  /** BM25 keyword retrieval (k1 = 6/5, b = 3/4) for a fixed query-term
    * set, top-20 documents. All arithmetic is integer-exact: with
    * rational k1/b the per-term score
    * `idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` reduces to
    * `idf · 44·tf·total div (20·tf·total + 6·total + 18·dl·N)` exactly
    * (avgdl = total/N substituted and cleared), and the log-free
    * scaled-ratio idf `(2(N−df)+1)·10³ div (2df+1)` keeps the classic
    * `ln((N−df+0.5)/(df+0.5))` ORDERING without touching floating
    * point (same reasoning as q_tfidf). The products run in
    * DECIMAL(38,0) — bigint would overflow near 10⁹ total tokens,
    * which a real corpus exceeds — with floor division spelled
    * `(n − n % d) / d` (exact: the subtraction makes the quotient an
    * integer, so the decimal divide cannot round; % and / on
    * non-negative decimals match DuckDB's hugeint `//`).
    *
    * Scale: [[termFreq]] + a doc-keyed length agg; df and the
    * (total, N) scalars are vocabulary/metadata-sized → '''broadcast'''.
    * The scored frame is "docs matching any query term" — O(corpus)
    * for common terms — so the top-20 is taken with orderBy().limit()
    * (TakeOrderedAndProject, per-partition top-k then a 20-row merge)
    * and only the 20 survivors are ranked by the unpartitioned
    * row_number (bounded frame, same pattern as [[qZipf]]).
    */
  private val bm25Terms = Seq("spark", "join", "window")

  private def qBm25(s: SparkSession, d: String): DataFrame = {
    val tf = termFreq(Tables.documents(s, d))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val scalars = dl.agg(sum(col("dl")).as("total"),
      count(lit(1)).as("n_docs"))
    val df = tf.filter(col("term").isInCollection(bm25Terms))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.filter(col("term").isInCollection(bm25Terms))
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf", expr(
        "((2 * (CAST(n_docs AS DECIMAL(38,0)) - df) + 1) * 1000)" +
          " div (2 * df + 1)"))
      .withColumn("num",
        expr("CAST(idf AS DECIMAL(38,0)) * 44 * tf * total"))
      .withColumn("den", expr(
        "CAST(20 AS DECIMAL(38,0)) * tf * total + 6 * total" +
          " + 18 * dl * n_docs"))
      .withColumn("tscore",
        expr("CAST((num - num % den) / den AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tscore")).as("score"),
        count(lit(1)).cast(IntegerType).as("n_terms"))
    scored
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("score"), col("n_terms"),
        col("rnk").cast(IntegerType).as("rnk"))
  }

  private val qBm25Sql: String = {
    val terms = bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH $termFreqSql,
       |dl AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT CAST(sum(dl) AS BIGINT) AS total,
       |    CAST(count(*) AS BIGINT) AS n_docs FROM dl),
       |df AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM tf WHERE term IN ($terms) GROUP BY 1),
       |m AS (
       |  SELECT tf.doc_id, tf.tf, dl.dl, sc.total, sc.n_docs,
       |    CAST(((2 * (sc.n_docs - df.df) + 1) * 1000) // (2 * df.df + 1)
       |         AS BIGINT) AS idf
       |  FROM tf
       |  JOIN df USING (term)
       |  JOIN dl USING (doc_id)
       |  CROSS JOIN sc
       |  WHERE tf.term IN ($terms)),
       |scored AS (
       |  SELECT doc_id,
       |    CAST(sum((CAST(idf AS HUGEINT) * 44 * tf * total) //
       |             (CAST(20 AS HUGEINT) * tf * total + 6 * total
       |              + 18 * dl * n_docs))
       |         AS BIGINT) AS score,
       |    CAST(count(*) AS INTEGER) AS n_terms
       |  FROM m GROUP BY 1)
       |SELECT doc_id, score, n_terms, CAST(rnk AS INTEGER) AS rnk
       |FROM (
       |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= 20""".stripMargin
  }

  // ----------------------------------------------------------- q_inverted
  /** Inverted-index build: per term, document frequency, total term
    * frequency, and the first 20 postings (doc_ids ascending). The
    * postings cap keeps the demo row width bounded; a production index
    * writes FULL postings partitioned by term — same single
    * aggregation, with the list sink swapped for a partitioned write.
    * Scale: one hash agg over [[termFreq]]'s output, keyed by term;
    * postings lists shuffle as (term, id) pairs, never text.
    */
  private def qInverted(s: SparkSession, d: String): DataFrame =
    termFreq(Tables.documents(s, d))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        // Postings serialized to CSV: the harness hashes scalar cells, so
        // the list is carried as a string in both engines (same 20-cap).
        array_join(slice(array_sort(collect_list(col("doc_id"))), 1, 20), ",")
          .as("postings"))

  private val qInvertedSql: String =
    s"""WITH $termFreqSql
       |SELECT term, CAST(count(*) AS BIGINT) AS df,
       |  CAST(sum(tf) AS BIGINT) AS total_tf,
       |  array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',')
       |    AS postings
       |FROM tf GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- q_redact
  /** Denylist scrubbing — the redaction pass a pipeline runs for PII /
    * banned terms before training: mask every whole-word denylist hit,
    * count hits, and report a digest of the redacted text (the digest
    * stands in for the rewritten text column so the oracle compares a
    * fixed-width value). Map-only: one codegen'd regex pass per row,
    * zero shuffle — the ideal 100 TB shape. Real PII patterns (emails,
    * phones, SSNs) are alternation branches in the same single regex.
    */
  private val denylist = Seq("customer", "supplier", "part")

  private def qRedact(s: SparkSession, d: String): DataFrame = {
    val pat = denylist.mkString("\\b(", "|", ")\\b")
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_count(lower(col("text")), lit(pat)).cast("long")
          .as("n_redacted"),
        md5(regexp_replace(lower(col("text")), pat, "[MASK]"))
          .as("redacted_md5"))
      .withColumn("clean", col("n_redacted") === 0)
  }

  private val qRedactSql: String = {
    val pat = denylist.mkString("\\b(", "|", ")\\b")
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(lower(text), '$pat')) AS BIGINT)
       |    AS n_redacted,
       |  md5(regexp_replace(lower(text), '$pat', '[MASK]', 'g'))
       |    AS redacted_md5,
       |  len(regexp_extract_all(lower(text), '$pat')) = 0 AS clean
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------- q_bigram_novelty
  /** Bigram-novelty quality score — the cheap stand-in for LM
    * perplexity filtering: the fraction of a document's bigram
    * occurrences that fall OUTSIDE the corpus's top-1000 bigram
    * vocabulary. Fluent text re-uses common word transitions; spam,
    * shuffled text and OCR noise emit transitions the corpus has
    * rarely seen — exactly what a KenLM-style filter scores, without a
    * model artifact or a single floating-point log.
    *
    * Scale: bigrams are md5-prefix-hashed to BIGINT pre-shuffle (as in
    * q_contamination) and the hashed frame is persisted — it feeds the
    * corpus-count branch and the per-doc branch. The vocabulary cut is
    * orderBy().limit(K) over the bigram-count frame
    * (TakeOrderedAndProject — per-partition top-K then a K-row merge,
    * never a global sort: distinct bigrams grow near-linearly with the
    * corpus) → '''broadcast''' into the membership join, so the
    * per-doc pass is map-only + one count aggregation. The cut
    * tie-break is (count DESC, hash) — deterministic on both engines
    * with no dependence on collation.
    */
  private val NOVELTY_VOCAB = 1000

  private def qBigramNovelty(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bg = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2), " +
          "i -> array_join(slice(tk, i + 1, 2), ' '))")).as("g"))
      .select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long").as("gh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = bg.groupBy(col("gh")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gh")).limit(NOVELTY_VOCAB)
      .select(col("gh"), lit(1).as("hit"))
    bg.join(broadcast(vocab), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (count(lit(1)) - count(col("hit"))).as("n_oov"))
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_bigrams")).as("oov_frac"))
      .withColumn("high_novelty", col("oov_frac") > 0.5)
  }

  private val qBigramNoveltySql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS tk
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS gh
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(tk) - 1),
       |      i -> array_to_string(tk[i+1:i+2], ' '))) AS g
       |    FROM tok WHERE len(tk) >= 2)),
       |cnts AS (SELECT gh, count(*) AS cnt FROM bg GROUP BY 1),
       |vocab AS (
       |  SELECT gh FROM (
       |    SELECT gh, row_number() OVER (ORDER BY cnt DESC, gh) AS rnk
       |    FROM cnts)
       |  WHERE rnk <= $NOVELTY_VOCAB),
       |agg AS (
       |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(count(*) - count(v.gh) AS BIGINT) AS n_oov
       |  FROM bg b LEFT JOIN vocab v ON v.gh = b.gh
       |  GROUP BY 1)
       |SELECT doc_id, n_bigrams, n_oov,
       |  CAST(n_oov AS DOUBLE) / n_bigrams AS oov_frac,
       |  CAST(n_oov AS DOUBLE) / n_bigrams > 0.5 AS high_novelty
       |FROM agg""".stripMargin

  // ------------------------------------------------------- q_bigram_lm
  /** Bigram LM estimation — the count/condition step of n-gram
    * language-model training (the model behind KenLM-style quality
    * filters): the top-[[LM_K]] word transitions with their history
    * counts and conditional probability P(w2|w1) in integer ppm
    * (`c(w1,w2)·10⁶ div c(w1·)` — no floating point, no log).
    *
    * Scale: ONE corpus pass — bigrams aggregate to (w1, w2, count)
    * directly (map-side partials carry pairs, never documents), and
    * the history count derives from the aggregated pair frame by a
    * second vocabulary-sized agg rather than re-scanning the corpus.
    * Top-k is TakeOrderedAndProject.
    */
  private val LM_K = 50

  private def qBigramLm(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 2), " +
          "i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bigram"))
    pairs
      .join(pairs.groupBy(col("w1")).agg(sum(col("c_bigram")).as("c_w1")),
        Seq("w1"))
      .orderBy(col("c_bigram").desc, col("w1"), col("w2"))
      .limit(LM_K)
      .select(col("w1"), col("w2"), col("c_bigram"), col("c_w1"),
        // bigram counts are corpus-scale → decimal numerator
        expr("CAST(c_bigram AS DECIMAL(38,0)) * 1000000 div c_w1")
          .as("p_cond_ppm"))
  }

  private val qBigramLmSql: String =
    s"""WITH tok AS (
       |  SELECT string_split(lower(text), ' ') AS tk FROM documents),
       |bgidx AS (
       |  SELECT tk, unnest(range(len(tk) - 1)) AS i
       |  FROM tok WHERE len(tk) >= 2),
       |bg AS (SELECT tk[i + 1] AS w1, tk[i + 2] AS w2 FROM bgidx),
       |pairs AS (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bigram
       |  FROM bg GROUP BY 1, 2),
       |hist AS (
       |  SELECT w1, CAST(sum(c_bigram) AS BIGINT) AS c_w1
       |  FROM pairs GROUP BY 1)
       |SELECT p.w1, p.w2, p.c_bigram, h.c_w1,
       |  CAST(CAST(p.c_bigram AS HUGEINT) * 1000000 // h.c_w1 AS BIGINT)
       |    AS p_cond_ppm
       |FROM pairs p JOIN hist h ON p.w1 = h.w1
       |ORDER BY p.c_bigram DESC, p.w1, p.w2
       |LIMIT $LM_K""".stripMargin

  // ----------------------------------------------------- q_vocab_growth
  /** Heaps-law vocabulary growth curve — the corpus-composition
    * diagnostic behind "is more data still adding new vocabulary":
    * per [[GROWTH_BUCKET]]-document bucket, token volume and FIRST-
    * SEEN word count, with cumulative totals. A flattening cum_vocab
    * curve says the corpus is saturating; a linear one says it keeps
    * contributing.
    *
    * Scale: ONE corpus pass, linear pipeline — the explode aggregates
    * straight to the (bucket, token) frame (vocabulary×buckets-sized,
    * map-side partials; plan-pinned single scan), each word's first
    * bucket is a token-partitioned window min over that frame (never
    * the corpus), and a row is a "new word" exactly when its bucket IS
    * the first. The cumulative totals are a TWO-LEVEL prefix sum (the
    * [[qPack]] sharding trick, range-sharded because order matters):
    * running sums WITHIN each [[GROWTH_SHARD]]-bucket shard ride a
    * shard-partitioned window, and the carry-in from earlier shards
    * comes from a broadcast `<`-self-join over the shard-totals frame
    * (shards = buckets/64 rows) — the bucket frame (corpus/50 rows,
    * linear in the corpus) never crosses a partition-less WindowExec.
    */
  private val GROWTH_BUCKET = 50
  private val GROWTH_SHARD = 64

  private def qVocabGrowth(s: SparkSession, d: String): DataFrame = {
    val buckets = Tables.documents(s, d)
      .select(expr(s"doc_id div $GROWTH_BUCKET").as("bucket"),
        explode(tokens(col("text"))).as("token"))
      .groupBy(col("bucket"), col("token"))
      .agg(count(lit(1)).as("c"))
      .withColumn("fb",
        min(col("bucket")).over(Window.partitionBy(col("token"))))
      .groupBy(col("bucket"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("bucket") === col("fb"), 1L).otherwise(0L))
          .as("new_words"))
      .withColumn("shard", expr(s"bucket div $GROWTH_SHARD"))
      // persisted: the bucket frame (corpus/50 rows) feeds both the
      // intra-shard running sums and the shard-totals carry, and the
      // carry join's inferred isnotnull(shard) filter makes the two
      // subtrees non-identical — exchange reuse alone would re-scan
      // the corpus for each consumer.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val intra = Window.partitionBy(col("shard")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val shardTot = buckets.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("st"), sum(col("new_words")).as("sv"))
    val carry = shardTot.alias("a")
      .join(broadcast(shardTot.alias("b")),
        col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.st")), lit(0L)).as("prev_tokens"),
        coalesce(sum(col("b.sv")), lit(0L)).as("prev_vocab"))
    buckets
      .withColumn("run_tokens", sum(col("n_tokens")).over(intra))
      .withColumn("run_vocab", sum(col("new_words")).over(intra))
      .join(broadcast(carry), Seq("shard"))
      .select(col("bucket"), col("n_tokens"), col("new_words"),
        (col("run_tokens") + col("prev_tokens")).as("cum_tokens"),
        (col("run_vocab") + col("prev_vocab")).as("cum_vocab"))
  }

  private val qVocabGrowthSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id // $GROWTH_BUCKET AS bucket,
       |    unnest(string_split(lower(text), ' ')) AS token
       |  FROM documents),
       |bt AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM tok GROUP BY 1),
       |fw AS (SELECT token, min(bucket) AS bucket FROM tok GROUP BY 1),
       |nw AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS new_words
       |  FROM fw GROUP BY 1)
       |SELECT b.bucket, b.n_tokens,
       |  coalesce(nw.new_words, 0) AS new_words,
       |  CAST(SUM(b.n_tokens) OVER (ORDER BY b.bucket) AS BIGINT)
       |    AS cum_tokens,
       |  CAST(SUM(coalesce(nw.new_words, 0)) OVER (ORDER BY b.bucket)
       |    AS BIGINT) AS cum_vocab
       |FROM bt b LEFT JOIN nw ON b.bucket = nw.bucket""".stripMargin

  // ------------------------------------------------------- q_dataset_card
  /** Dataset-card rollup — the corpus summary a dataset release
    * prints: per (lang, source) cell plus per-lang, per-source, and
    * grand-total margins (GROUPING SETS), each with document count,
    * token total, exact-dup document count (docs whose fingerprint
    * has an earlier copy), and mean chars. One composed pass over
    * the stats the individual queries expose separately.
    *
    * Scale: the dup flag is a min-over-fingerprint-partition window —
    * ONE shuffle of the (already projected, text-free) frame and ONE
    * fingerprint pass, where an aggregate-and-join-back would hash the
    * regex-normalized text twice and shuffle twice (fingerprint is the
    * most expensive scalar in the query); fingerprint groups are
    * dup-cluster-sized, never corpus-sized. The rollup itself follows
    * the two-level grouping-sets discipline (pre-aggregate to the
    * finest (lang, source) grain, Expand over group-count rows — never
    * over the corpus; see SCALE.md round-4 notes).
    */
  private def qDatasetCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val flagged = docs
      .select(fingerprint(col("text")).as("fp"), col("doc_id"),
        col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("is_dup",
        (col("doc_id") =!= min(col("doc_id"))
          .over(Window.partitionBy(col("fp")))).cast("long"))
    val fine = flagged.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("pn"), sum(col("n_tok")).as("pt"),
        sum(col("n_chars")).as("pc"), sum(col("is_dup")).as("pd"))
    fine.createOrReplaceTempView("graft_card_pre")
    s.sql(
      """SELECT lang, source, SUM(pn) AS n_docs,
        |  SUM(pt) AS total_tokens, SUM(pd) AS n_dups,
        |  CAST(SUM(pc) AS DOUBLE) / SUM(pn) AS mean_chars
        |FROM graft_card_pre
        |GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())"""
        .stripMargin)
  }

  private val qDatasetCardSql: String =
    """WITH f AS (
      |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
      |    min(doc_id) AS first_id
      |  FROM documents GROUP BY 1),
      |base AS (
      |  SELECT d.lang, d.source,
      |    CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS n_tok,
      |    CAST(length(d.text) AS BIGINT) AS n_chars,
      |    CAST(d.doc_id <> f.first_id AS BIGINT) AS is_dup
      |  FROM documents d
      |  JOIN f ON f.fp = md5(trim(regexp_replace(regexp_replace(
      |    lower(d.text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))))
      |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  CAST(sum(is_dup) AS BIGINT) AS n_dups,
      |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS BIGINT) AS mean_chars
      |FROM base
      |GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())""".stripMargin

  // ----------------------------------------------------------- q_cooccur
  /** Token co-occurrence with scaled PMI — the corpus-statistics pass
    * behind collocation mining and word-association analysis: pairs
    * of tokens within a forward window of [[COOCCUR_WIN]] positions,
    * scored by ⌊c(a,b)·N·10⁶ / (c(a)·c(b))⌋ — the log-free monotone
    * transform of pointwise mutual information (same move as
    * q_tfidf's idf), integer-exact on both engines. Pairs ordered
    * (a ≤ b) so each co-occurrence counts once; noise floor
    * c(a,b) ≥ [[COOCCUR_MIN]]; top-50 by (pmi, a, b).
    *
    * Scale: pair generation is MAP-ONLY — pairs materialize inside
    * the row from the token array (no doc-keyed self-join, which
    * would shuffle the token stream twice); the only shuffles are the
    * (pair → count) and (token → count) aggregations. Unigram counts
    * and the N scalar are vocabulary-sized → '''broadcast''' into the
    * scoring join. The ·10⁶ product runs in DECIMAL(38,0) (the q_chi2
    * discipline) — BIGINT would wrap silently past the bench envelope
    * while the oracle errors.
    */
  private val COOCCUR_WIN = 2
  private val COOCCUR_MIN = 5

  private def qCooccur(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tk = docs.select(col("doc_id"), tokens(col("text")).as("tk"))
    // CASE guard: Spark's sequence(1, 0) is DESCENDING ([1, 0]), not
    // empty, so a doc shorter than the window needs the empty branch.
    val pairCol = expr(
      s"""flatten(transform(sequence(1, $COOCCUR_WIN), o ->
         |  CASE WHEN size(tk) > o THEN
         |    transform(sequence(1, size(tk) - o), i ->
         |      struct(least(element_at(tk, i), element_at(tk, i + o)) AS a,
         |             greatest(element_at(tk, i), element_at(tk, i + o)) AS b))
         |  ELSE array() END))""".stripMargin)
    val pairs = tk.select(explode(pairCol).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= COOCCUR_MIN)
    val uni = docs.select(explode(tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n"))
    pairs
      .join(broadcast(uni.select(col("t").as("a"), col("c").as("c_a"))),
        Seq("a"))
      .join(broadcast(uni.select(col("t").as("b"), col("c").as("c_b"))),
        Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        // DECIMAL(38,0) routing (the q_chi2 discipline): c_ab·N·10⁶ wraps
        // silently in BIGINT past the bench envelope while the oracle
        // errors — decimal holds to 38 digits on both engines.
        expr("CAST((CAST(c_ab AS DECIMAL(38,0)) * n * 1000000)" +
          " div (c_a * c_b) AS BIGINT)").as("pmi_scaled"))
      .orderBy(col("pmi_scaled").desc, col("a"), col("b"))
      .limit(50)
  }

  private val qCooccurSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS tk
       |  FROM documents),
       |pairs AS (
       |  SELECT p.a, p.b, CAST(count(*) AS BIGINT) AS c_ab FROM (
       |    SELECT unnest(flatten(list_transform(range(1, ${COOCCUR_WIN + 1}),
       |      o -> list_transform(range(1, greatest(len(tk) - o, 0) + 1),
       |        i -> {'a': least(tk[i], tk[i + o]),
       |              'b': greatest(tk[i], tk[i + o])})))) AS p
       |    FROM tk)
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $COOCCUR_MIN),
       |uni AS (
       |  SELECT unnest(tk) AS t FROM tk),
       |cnt AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt)
       |SELECT p.a, p.b, p.c_ab, ca.c AS c_a, cb.c AS c_b,
       |  CAST((CAST(p.c_ab AS HUGEINT) * (SELECT n FROM n) * 1000000)
       |       // (ca.c * cb.c) AS BIGINT)
       |    AS pmi_scaled
       |FROM pairs p
       |JOIN cnt ca ON ca.t = p.a
       |JOIN cnt cb ON cb.t = p.b
       |ORDER BY pmi_scaled DESC, a, b
       |LIMIT 50""".stripMargin

  // ------------------------------------------------------- q_span_corrupt
  /** Deterministic MLM-style corruption — the masking pass that turns
    * a curated corpus into masked-LM training pairs: token i of doc d
    * is masked iff md5(d ":" i) mod 100 < [[MASK_PCT]] (content-
    * independent, reproducible across engines and runs — no RNG
    * state to ship). Output carries the mask count and md5 digests of
    * the masked text and of the extracted targets (digests stand in
    * for the rewritten columns so the oracle compares fixed-width
    * values; a real pipeline writes the strings). T5-style span
    * collapse is the same map with run-length grouping of the mask
    * flags before sentinel assignment.
    *
    * Scale: pure map — one codegen'd transform over the token array
    * per row, zero shuffle, zero joins. The ideal 100 TB shape.
    */
  private val MASK_PCT = 15

  private def qSpanCorrupt(s: SparkSession, d: String): DataFrame = {
    val masked = expr(
      s"""transform(tk, (t, i) ->
         |  IF(CAST(conv(substring(md5(concat(doc_id, ':', i)), 1, 4),
         |           16, 10) AS BIGINT) % 100 < $MASK_PCT, '<mask>', t))"""
        .stripMargin)
    val targets = expr(
      s"""filter(transform(tk, (t, i) ->
         |  IF(CAST(conv(substring(md5(concat(doc_id, ':', i)), 1, 4),
         |           16, 10) AS BIGINT) % 100 < $MASK_PCT, t, NULL)),
         |  x -> x IS NOT NULL)""".stripMargin)
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        size(col("tk")).cast(IntegerType).as("n_tokens"),
        masked.as("mk"), targets.as("tg"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("tg")).cast(IntegerType).as("n_masked"),
        md5(concat_ws(" ", col("mk"))).as("masked_md5"),
        md5(concat_ws(" ", col("tg"))).as("targets_md5"))
  }

  private val qSpanCorruptSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS tk
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, len(tk) AS n_tokens,
       |    list_transform(tk, (t, i) ->
       |      CASE WHEN CAST('0x' || substr(md5(doc_id || ':' || (i - 1)),
       |                     1, 4) AS BIGINT) % 100 < $MASK_PCT
       |           THEN '<mask>' ELSE t END) AS mk,
       |    list_filter(
       |      list_transform(tk, (t, i) ->
       |        CASE WHEN CAST('0x' || substr(md5(doc_id || ':' || (i - 1)),
       |                       1, 4) AS BIGINT) % 100 < $MASK_PCT
       |             THEN t ELSE NULL END),
       |      x -> x IS NOT NULL) AS tg
       |  FROM tok)
       |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       |  CAST(len(tg) AS INTEGER) AS n_masked,
       |  md5(coalesce(array_to_string(mk, ' '), '')) AS masked_md5,
       |  -- coalesce: DuckDB's array_to_string of an EMPTY list is NULL,
       |  -- Spark's concat_ws is '' — align on '' for unmasked docs
       |  md5(coalesce(array_to_string(tg, ' '), '')) AS targets_md5
       |FROM m""".stripMargin

  // -------------------------------------------------------- q_rank_fusion
  /** Hybrid retrieval — reciprocal-rank fusion of the BM25 keyword
    * list ([[qBm25]], terms {spark, join, window}) and the embedding
    * top-20 for probe vector 0 (`vec_id` keys the document's embedding
    * row). RRF score = Σ_lists ⌊10⁹ / (60 + rank)⌋ — the floor keeps
    * the classic 1/(k+rank) ORDERING while staying integer-exact
    * across engines (the same ln-free move as q_tfidf's idf); a doc
    * missing from a list contributes 0. This is the fusion step every
    * hybrid (keyword + vector) retrieval stack runs over its per-modality
    * top-k lists.
    *
    * Scale: both inputs are top-k lists — bounded, rank-carrying, tiny
    * — so fusion is a full-outer join + one bounded sort regardless of
    * corpus size. The embedding side plans as TakeOrderedAndProject
    * (orderBy().limit()), never a global sort; the BM25 side is the
    * already-bounded [[qBm25]]. Fusing R lists generalizes to a union
    * + one grouped sum keyed by doc.
    */
  private val RRF_K = 60
  private val FUSE_TOP = 20

  private def qRankFusion(s: SparkSession, d: String): DataFrame = {
    graft.functions.VecDot.register(s)
    val bm = qBm25(s, d).select(col("doc_id"), col("rnk").as("bm_rnk"))
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probe = emb.filter(col("vec_id") === 0).select(col("v").as("q"))
    val scored = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        (Similarity.dot(col("q"), col("v")) /
          (Similarity.norm(col("q")) * Similarity.norm(col("v"))))
          .as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(FUSE_TOP)
    val ann = scored
      .withColumn("ann_rnk", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc))
        .cast(IntegerType))
      .select(col("vec_id").as("doc_id"), col("ann_rnk"))
    bm.join(ann, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"1000000000 div ($RRF_K + bm_rnk)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($RRF_K + ann_rnk)"), lit(0L)))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("doc_id")))
        .cast(IntegerType))
      .select(col("doc_id"), col("bm_rnk"), col("ann_rnk"),
        col("rrf_score"), col("rnk"))
  }

  private val qRankFusionSql: String = {
    def dotSql(a: String, b: String): String =
      s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
    s"""WITH bm AS (
       |  SELECT doc_id, CAST(rnk AS INTEGER) AS bm_rnk
       |  FROM ( $qBm25Sql )),
       |ann0 AS (
       |  SELECT e.vec_id AS doc_id,
       |    ${dotSql("q.embedding", "e.embedding")} /
       |      (sqrt(${dotSql("q.embedding", "q.embedding")}) *
       |       sqrt(${dotSql("e.embedding", "e.embedding")})) AS cos
       |  FROM embeddings e, embeddings q
       |  WHERE q.vec_id = 0 AND e.vec_id <> 0),
       |ann AS (
       |  SELECT doc_id, CAST(rnk AS INTEGER) AS ann_rnk FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rnk
       |    FROM ann0)
       |  WHERE rnk <= $FUSE_TOP),
       |f AS (
       |  SELECT coalesce(bm.doc_id, ann.doc_id) AS doc_id,
       |    bm.bm_rnk, ann.ann_rnk,
       |    coalesce(CAST(1000000000 AS BIGINT) // ($RRF_K + bm.bm_rnk), 0)
       |      + coalesce(CAST(1000000000 AS BIGINT) // ($RRF_K + ann.ann_rnk), 0)
       |      AS rrf_score
       |  FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.doc_id)
       |SELECT doc_id, bm_rnk, ann_rnk, CAST(rrf_score AS BIGINT) AS rrf_score,
       |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
       |       AS INTEGER) AS rnk
       |FROM f""".stripMargin
  }

  // ------------------------------------------------------ q_feature_hash
  /** Hashing-trick bucket audit — the collision profile of feature
    * hashing (Weinberger et al.'s hashing trick: categorical/token
    * features mapped to a fixed D-dimensional space by `hash mod D`,
    * the standard vectorizer when the vocabulary is unbounded): per
    * bucket, total token occurrences and DISTINCT terms sharing the
    * bucket (the collision count that degrades model quality and
    * drives the choice of D). Hash = the codegen'd
    * [[graft.functions.PolyHash]] Expression; DuckDB replays the
    * identical fold via `list_reduce` ([[Dedup.tokHashSql]]), so
    * bucket assignment is bit-identical cross-engine.
    *
    * Scale: output is D rows regardless of corpus size. The distinct
    * count is a SINGLE-distinct aggregate — Catalyst plans it as two
    * hash aggregations keyed (bucket, term) then (bucket), partials
    * map-side, NO Expand (the q_profile lesson); work ∝ corpus, state
    * ∝ vocabulary.
    */
  private val FHASH_BUCKETS = 4096L

  private def qFeatureHash(s: SparkSession, d: String): DataFrame = {
    graft.functions.PolyHash.register(s)
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .select(col("term"),
        pmod(graft.functions.PolyHash.poly_hash(col("term")),
          lit(FHASH_BUCKETS)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("term")).as("n_terms"))
  }

  private val qFeatureHashSql: String =
    s"""WITH tok AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents),
       |h AS (
       |  SELECT term,
       |    ${Dedup.tokHashSql("term")} % $FHASH_BUCKETS AS bucket
       |  FROM tok WHERE term <> '')
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(count(DISTINCT term) AS BIGINT) AS n_terms
       |FROM h GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q_normalize
  /** Unicode NFC normalization over the corpus — the byte-canonical
    * pass that must precede any hash-based dedup ([[qFingerprint]],
    * MinHash): decomposed `e`+U+0301 and precomposed `é` are equal
    * text with unequal bytes, and un-normalized corpora split token
    * statistics and under-deduplicate. The corpus here is ASCII, so
    * the query CONSTRUCTS a decomposed suffix (`'e'` + combining
    * acute) on every row, normalizes through the codegen'd
    * [[graft.functions.NfcNormalize]] Expression (Spark ships no
    * normalization built-in), and emits codepoint lengths before/after
    * (composition shortens by exactly 1) plus the md5 of the
    * normalized text — oracle-compared against DuckDB's utf8proc
    * `nfc_normalize`, i.e. two independent UAX #15 implementations
    * agreeing byte-for-byte.
    *
    * Scale: map-only, zero shuffle, inside whole-stage codegen with an
    * isNormalized fast path (already-NFC rows — the common case — copy
    * nothing).
    */
  private def qNormalize(s: SparkSession, d: String): DataFrame = {
    graft.functions.NfcNormalize.register(s)
    val raw = concat(substring(col("text"), 1, 40), lit("e\u0301"))
    Tables.documents(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        length(col("raw")).as("len_raw"),
        graft.functions.NfcNormalize.nfc_normalize(col("raw")).as("norm"))
      .select(col("doc_id"), col("len_raw"),
        length(col("norm")).as("len_norm"),
        md5(col("norm")).as("h"))
  }

  private val qNormalizeSql: String =
    """WITH r AS (
      |  SELECT doc_id, substr(text, 1, 40) || 'e' || chr(769) AS raw
      |  FROM documents)
      |SELECT doc_id, CAST(length(raw) AS INTEGER) AS len_raw,
      |  CAST(length(nfc_normalize(raw)) AS INTEGER) AS len_norm,
      |  md5(nfc_normalize(raw)) AS h
      |FROM r""".stripMargin

  // -------------------------------------------------------------- q_chi2
  /** χ² token–label association — the classic feature-selection /
    * drift-detection pass over a labeled corpus (which tokens are
    * over-represented in one language?): for each (term, lang) pair,
    * the 2×2 contingency table a = docs with term∧lang, b = term∧¬lang,
    * c = ¬term∧lang, d = neither, scored by
    * `χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`. Pure integer
    * arithmetic — no logs, no floats — scaled ·10⁶ in DECIMAL(38,0)
    * (N·N⁴·10⁶ ≈ 10²⁴ at sf0.1 overflows bigint; the q_bm25
    * discipline) with floor division spelled `(n − n % d) / d`, so
    * both engines produce the identical ppm score. Noise floor: term
    * must appear in ≥ [[CHI2_MIN_DF]] docs and not all docs (the
    * all-docs column zeroes a denominator factor). Top-50 by
    * (χ², term, lang).
    *
    * Scale: one distinct-(doc, term, lang) pass → one (term, lang)
    * count agg; per-term df derives from THAT agg (vocabulary-sized —
    * never a second corpus scan), and the per-lang/N scalars are
    * metadata-sized → '''broadcast''' into the scoring join. The only
    * corpus-wide shuffle carries (term, lang) pairs. Top-50 plans as
    * TakeOrderedAndProject, never a global sort.
    */
  private val CHI2_MIN_DF = 10
  private val CHI2_TOP    = 50

  private def qChi2(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(tokens(col("text")))).as("term"))
      .filter(col("term") =!= "")
    val ctl = tok.groupBy(col("term"), col("lang"))
      .agg(count(lit(1)).as("a"))
    val ct = ctl.groupBy(col("term")).agg(sum(col("a")).as("df"))
      .filter(col("df") >= CHI2_MIN_DF)
    val cl = docs.groupBy(col("lang")).agg(count(lit(1)).as("cl"))
    val n = docs.agg(count(lit(1)).as("n"))
    ctl
      .join(broadcast(ct), Seq("term"))
      .join(broadcast(cl), Seq("lang"))
      .crossJoin(broadcast(n))
      // df < n: the all-docs term zeroes the (n - df) denominator factor;
      // cl < n: a single-language corpus zeroes (n - cl) the same way
      // (DuckDB errors on the division, Spark yields null — guard both).
      .filter(col("df") < col("n") && col("cl") < col("n"))
      .withColumn("det", expr(
        // ad − bc with b = df−a, c = cl−a, d = n−df−cl+a simplifies to
        // n·a − df·cl; keep the simplified form (fewer 38-digit ops).
        "CAST(n AS DECIMAL(38,0)) * a - CAST(df AS DECIMAL(38,0)) * cl"))
      .withColumn("num",
        expr("CAST(n AS DECIMAL(38,0)) * det * det * 1000000"))
      .withColumn("den", expr(
        "CAST(df AS DECIMAL(38,0)) * (n - df) * cl * (n - cl)"))
      .withColumn("chi2_ppm",
        expr("CAST((num - num % den) / den AS BIGINT)"))
      .orderBy(col("chi2_ppm").desc, col("term"), col("lang"))
      .limit(CHI2_TOP)
      .select(col("term"), col("lang"), col("a"), col("df"),
        col("chi2_ppm"))
  }

  private val qChi2Sql: String =
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, lang,
       |    unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents),
       |ctl AS (
       |  SELECT term, lang, CAST(count(*) AS BIGINT) AS a
       |  FROM tok WHERE term <> '' GROUP BY 1, 2),
       |ct AS (
       |  SELECT term, CAST(sum(a) AS BIGINT) AS df FROM ctl GROUP BY 1
       |  HAVING sum(a) >= $CHI2_MIN_DF),
       |cl AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS cl
       |  FROM documents GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |scored AS (
       |  SELECT ctl.term, ctl.lang, ctl.a, ct.df,
       |    CAST((CAST(n.n AS HUGEINT) *
       |          (n.n * ctl.a - ct.df * cl.cl) *
       |          (n.n * ctl.a - ct.df * cl.cl) * 1000000)
       |      // (CAST(ct.df AS HUGEINT) * (n.n - ct.df)
       |          * cl.cl * (n.n - cl.cl)) AS BIGINT) AS chi2_ppm
       |  FROM ctl
       |  JOIN ct ON ct.term = ctl.term
       |  JOIN cl ON cl.lang = ctl.lang
       |  CROSS JOIN n
       |  WHERE ct.df < n.n AND cl.cl < n.n)
       |SELECT term, lang, a, df, chi2_ppm
       |FROM scored
       |ORDER BY chi2_ppm DESC, term, lang
       |LIMIT $CHI2_TOP""".stripMargin

  // --------------------------------------------------- q_doc_surprisal
  /** Per-document surprisal under the corpus bigram LM — the
    * model-based quality signal behind KenLM-style perplexity
    * filters, kept integer-exact: each bigram's surprisal proxy is
    * the inverse conditional probability `c(w1·)·10⁶ div c(w1,w2)`
    * (high when the transition is rare for its history — no log, no
    * float), and a document scores the ppm-average over its bigrams.
    * Top-[[SURPRISAL_K]] most-surprising documents surface for
    * review — exactly how an LM filter flags low-quality/outlier
    * text for exclusion.
    *
    * Scale: the corpus-scale exploded bigram frame is REPARTITIONED
    * ON (w1, w2) ONCE, and every downstream consumer reuses that one
    * exchange (`ReusedExchangeExec`): the LM agg to (w1, w2, count)
    * needs exactly that clustering, the head-word counts are a
    * vocab-scale agg of the vocab²-scale pair frame whose result is
    * '''broadcast''' back (so the LM join preserves the (w1, w2)
    * partitioning), and the probe join is then co-partitioned on both
    * sides — zero additional corpus-scale shuffles until the final
    * doc_id agg (map-side combined to doc-scale). A hash join between
    * a corpus-scale token frame and a vocab-scale count frame, never
    * doc×doc. A document's own bigrams are in the counts, so every
    * join matches (no null probability) and the divisor is ≥ 1.
    */
  private val SURPRISAL_K = 50

  private def qDocSurprisal(s: SparkSession, d: String): DataFrame = {
    val docBigrams = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2), " +
          "i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .repartition(col("w1"), col("w2"))
    val pairs = docBigrams
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bigram"))
    val lm = pairs.join(
      broadcast(
        pairs.groupBy(col("w1")).agg(sum(col("c_bigram")).as("c_w1"))),
      Seq("w1"))
    docBigrams.join(lm, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        // c_w1 is a corpus-scale head-word count → decimal numerator
        sum(expr("CAST(c_w1 AS DECIMAL(38,0)) * 1000000 div c_bigram"))
          .as("total_surprisal"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("total_surprisal div n_bigrams").as("avg_surprisal_ppm"))
      .orderBy(col("avg_surprisal_ppm").desc, col("doc_id"))
      .limit(SURPRISAL_K)
  }

  private val qDocSurprisalSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS tk
       |  FROM documents),
       |bgidx AS (
       |  SELECT doc_id, tk, unnest(range(len(tk) - 1)) AS i
       |  FROM tok WHERE len(tk) >= 2),
       |bg AS (
       |  SELECT doc_id, tk[i + 1] AS w1, tk[i + 2] AS w2 FROM bgidx),
       |pairs AS MATERIALIZED (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bigram
       |  FROM bg GROUP BY 1, 2),
       |lm AS (
       |  SELECT p.w1, p.w2, p.c_bigram, h.c_w1
       |  FROM pairs p
       |  JOIN (SELECT w1, CAST(sum(c_bigram) AS BIGINT) AS c_w1
       |        FROM pairs GROUP BY 1) h ON p.w1 = h.w1),
       |scored AS (
       |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(CAST(lm.c_w1 AS HUGEINT) * 1000000 // lm.c_bigram)
       |         AS BIGINT) AS total_surprisal
       |  FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
       |  GROUP BY 1)
       |SELECT doc_id, n_bigrams,
       |  total_surprisal // n_bigrams AS avg_surprisal_ppm
       |FROM scored
       |ORDER BY avg_surprisal_ppm DESC, doc_id
       |LIMIT $SURPRISAL_K""".stripMargin

  // ------------------------------------------------------ q_source_hhi
  /** Per-source vocabulary concentration — the Herfindahl–Hirschman
    * index (Σ share², the Simpson-diversity complement) over unigram
    * frequencies, in exact integer ppm: `Σc²·10⁶ div N²`. A source
    * whose token mass concentrates on few types (boilerplate, spam,
    * template farms) scores high; a diverse source scores near the
    * uniform floor. Reported with vocabulary size and the top type's
    * share — the dashboard row a mixture designer reads before
    * weighting sources. (Entropy needs a log; HHI carries the same
    * concentration signal in pure integer arithmetic, so both
    * engines agree bit-for-bit.)
    *
    * Scale: one corpus pass to (source, word, count) — map-side
    * combinable — then a vocabulary-sized re-agg per source. The Σc²
    * and N² products route through DECIMAL(38,0)/HUGEINT end to end:
    * at 100 TB a source holds ~10¹³ tokens, so both cross int64
    * (Σc² alone can reach 10²⁶); the ppm quotients always fit a long.
    */
  private def qSourceHhi(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("ssq"),
        max(col("c")).as("top_c"))
      .select(col("source"), col("n_tokens"), col("n_vocab"),
        expr("ssq * 1000000" +
          " div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)")
          .as("hhi_ppm"),
        expr("CAST(top_c AS DECIMAL(38,0)) * 1000000 div n_tokens")
          .as("top_share_ppm"))

  private val qSourceHhiSql: String =
    """WITH wc AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS word
      |  FROM documents),
      |cnt AS (
      |  SELECT source, word, CAST(count(*) AS BIGINT) AS c
      |  FROM wc GROUP BY 1, 2),
      |agg AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_vocab,
      |    SUM(CAST(c AS HUGEINT) * c) AS ssq, MAX(c) AS top_c
      |  FROM cnt GROUP BY 1)
      |SELECT source, n_tokens, n_vocab,
      |  CAST(ssq * 1000000 // (CAST(n_tokens AS HUGEINT) * n_tokens)
      |       AS BIGINT) AS hhi_ppm,
      |  CAST(CAST(top_c AS HUGEINT) * 1000000 // n_tokens AS BIGINT)
      |    AS top_share_ppm
      |FROM agg""".stripMargin

  // ----------------------------------------------------------- q_keyphrases
  /** RAKE keyphrase extraction (Rose et al. 2010) — corpus top-20
    * multi-word keyphrases. Candidate phrases are maximal runs of
    * non-stopword tokens (≤ [[RAKE_MAX_LEN]] words); each word scores
    * deg(w)/freq(w) over the candidate set (deg = Σ length of the
    * phrases containing w — favors words that travel in long
    * phrases; freq = raw instance count), a phrase scores the sum of
    * its words — here as `Σ deg(w)·10⁶ div freq(w)` integer ppm, so
    * ranking is bit-identical cross-engine (the published float
    * ratio adds nothing but nondeterminism).
    *
    * Scale: phrase segmentation is a per-document running stopword
    * count (window PARTITIONED by doc — doc-bounded, never global);
    * word stats are vocabulary-keyed aggregations; the score join is
    * phrase-word × vocabulary keyed on the word; identical phrase
    * instances collapse by text before the top-20
    * `orderBy().limit()` (TakeOrderedAndProject). Nothing scales
    * with corpus size except the linear scan and vocabulary-sized
    * frames.
    */
  private val RAKE_MAX_LEN = 4

  private def qKeyphrases(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .withColumnRenamed("pos", "pos").withColumnRenamed("col", "w")
    val seg = toks
      .withColumn("stop",
        col("w").isInCollection(stopwords).cast("long"))
      .withColumn("sid", sum(col("stop")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("stop") === 0)
    val phr = seg.groupBy(col("doc_id"), col("sid"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w"))).as("phrase"),
        collect_list(col("w")).as("ws"),
        count(lit(1)).as("plen"))
      .filter(col("plen") <= RAKE_MAX_LEN)
    val pw = phr.select(col("doc_id"), col("sid"), col("phrase"),
      col("plen"), explode(col("ws")).as("w"))
    val stats = pw.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    val inst = pw.join(stats, Seq("w"))
      .groupBy(col("doc_id"), col("sid"), col("phrase"))
      // deg sums phrase lengths corpus-wide per word → decimal
      .agg(sum(expr("CAST(deg AS DECIMAL(38,0)) * 1000000 div freq"))
        .as("score_ppm"))
    val fam = inst.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occur"), min(col("score_ppm")).as("score_ppm"))
    fam.orderBy(col("score_ppm").desc, col("n_occur").desc, col("phrase"))
      .limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score_ppm").desc, col("n_occur").desc,
          col("phrase"))).cast("int"))
  }

  private val qKeyphrasesSql: String = {
    val sw = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(unnest(range(len(tk))) AS INTEGER) AS pos,
       |    unnest(tk) AS w
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |        FROM documents)),
       |seg AS (
       |  SELECT doc_id, pos, w,
       |    CASE WHEN w IN ($sw) THEN 1 ELSE 0 END AS stop,
       |    sum(CASE WHEN w IN ($sw) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS sid
       |  FROM toks),
       |phr AS (
       |  SELECT doc_id, sid, string_agg(w, ' ' ORDER BY pos) AS phrase,
       |    list(w) AS ws, CAST(count(*) AS BIGINT) AS plen
       |  FROM seg WHERE stop = 0 GROUP BY 1, 2),
       |pw AS (
       |  SELECT doc_id, sid, phrase, plen, unnest(ws) AS w
       |  FROM phr WHERE plen <= $RAKE_MAX_LEN),
       |stats AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |    CAST(sum(plen) AS BIGINT) AS deg
       |  FROM pw GROUP BY 1),
       |inst AS (
       |  SELECT doc_id, sid, phrase,
       |    CAST(sum(CAST(deg AS HUGEINT) * 1000000 // freq) AS BIGINT)
       |      AS score_ppm
       |  FROM pw JOIN stats USING (w) GROUP BY 1, 2, 3),
       |fam AS (
       |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occur,
       |    min(score_ppm) AS score_ppm
       |  FROM inst GROUP BY 1)
       |SELECT phrase, n_occur, score_ppm, CAST(rnk AS INTEGER) AS rnk
       |FROM (
       |  SELECT *, row_number() OVER (
       |    ORDER BY score_ppm DESC, n_occur DESC, phrase) AS rnk
       |  FROM fam)
       |WHERE rnk <= 20""".stripMargin
  }

  // ------------------------------------------------------------ q_templates
  /** Content-TEMPLATE mining — documents grouped by their VOCABULARY
    * signature: mask digit runs to `0` (the log-template move, Drain
    * He et al. 2017, reduced to its scalable core), tokenize, and
    * fingerprint the SORTED DISTINCT token set. A family is a set of
    * documents built from exactly the same words — shuffled,
    * repeated, or re-ordered machine-generated variants (exact
    * Jaccard = 1), the degenerate corner of near-dup space that
    * [[graft.llm.Dedup]]'s MinHash only APPROXIMATES and exact dedup
    * (byte-identical) misses entirely. Top-20 families by population
    * with spread across sources — a family spanning ONE source is
    * boilerplate ([[graft.llm.Mixing]] q_boilerplate territory);
    * spanning MANY it is syndicated/templated content the mixture
    * planner must know about.
    *
    * Scale: map-only mask + tokenize + hash (the token set never
    * leaves the row — only its 32-hex md5 shuffles), ONE groupBy on
    * the template hash (map-side combined; min(sample) carries one
    * 60-char prefix per partial), top-20 via `orderBy().limit()`
    * (TakeOrderedAndProject), rank over the 20 rows.
    */
  private def qTemplates(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val masked = regexp_replace(
      regexp_replace(col("text"), "[0-9]+", "0"), " +", " ")
    val sig = concat_ws(" ",
      array_sort(array_distinct(split(masked, " "))))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(sig.cast("binary")).as("template_id"),
        substring(col("text"), 1, 60).as("sample"))
      .groupBy(col("template_id"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("example_doc"),
        min(col("sample")).as("sample"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("template_id"))
      .limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_docs").desc, col("template_id")))
        .cast("int"))
  }

  private val qTemplatesSql: String =
    """WITH m AS (
      |  SELECT doc_id, source,
      |    md5(array_to_string(list_sort(list_distinct(string_split(
      |      regexp_replace(regexp_replace(text, '[0-9]+', '0', 'g'),
      |                     ' +', ' ', 'g'), ' '))), ' ')) AS template_id,
      |    substr(text, 1, 60) AS sample
      |  FROM documents),
      |fam AS (
      |  SELECT template_id, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |    min(doc_id) AS example_doc, min(sample) AS sample
      |  FROM m GROUP BY 1)
      |SELECT template_id, n_docs, n_sources, example_doc, sample,
      |  CAST(rnk AS INTEGER) AS rnk
      |FROM (
      |  SELECT *, row_number() OVER (
      |    ORDER BY n_docs DESC, template_id) AS rnk
      |  FROM fam WHERE n_docs >= 2)
      |WHERE rnk <= 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_surprisal" -> qDocSurprisal _,
    "q_source_hhi"  -> qSourceHhi _,
    "q_chi2"        -> qChi2 _,
    "q_feature_hash" -> qFeatureHash _,
    "q_normalize"   -> qNormalize _,
    "q_rank_fusion" -> qRankFusion _,
    "q_span_corrupt" -> qSpanCorrupt _,
    "q_cooccur"     -> qCooccur _,
    "q_dataset_card" -> qDatasetCard _,
    "q_bigram_novelty" -> qBigramNovelty _,
    "q_bigram_lm"   -> qBigramLm _,
    "q_vocab_growth" -> qVocabGrowth _,
    "q_keyphrases"  -> qKeyphrases _,
    "q_templates"   -> qTemplates _,
    "q_vocab_coverage" -> qVocabCoverage _,
    "q_repetition"  -> qRepetition _,
    "q_bm25"        -> qBm25 _,
    "q_inverted"    -> qInverted _,
    "q_redact"      -> qRedact _,
    "q_vocab"       -> qVocab _,
    "q_readability" -> qReadability _,
    "q_zipf"        -> qZipf _,
    "q_text_stats"  -> qTextStats _,
    "q_lang_id"     -> qLangId _,
    "q_langid_confusion" -> qLangidConfusion _,
    "q_oov_rate"    -> qOovRate _,
    "q_token_count" -> qTokenCount _,
    "q_fingerprint" -> qFingerprint _,
    "q_chunk"       -> qChunk _,
    "q_curate"      -> qCurate _,
    "q_split"       -> qSplit _,
    "q_leakage"     -> qLeakage _,
    "q_pack"        -> qPack _,
    "q_contamination" -> qContamination _,
    "q_stratified"  -> qStratified _,
    "q_tfidf"       -> qTfidf _,
    "q_weighted_sample" -> qWeightedSample _
  )

  val oracles: Map[String, String] = Map(
    "q_keyphrases"  -> qKeyphrasesSql,
    "q_templates"   -> qTemplatesSql,
    "q_doc_surprisal" -> qDocSurprisalSql,
    "q_source_hhi"  -> qSourceHhiSql,
    "q_chi2"        -> qChi2Sql,
    "q_feature_hash" -> qFeatureHashSql,
    "q_normalize"   -> qNormalizeSql,
    "q_rank_fusion" -> qRankFusionSql,
    "q_span_corrupt" -> qSpanCorruptSql,
    "q_cooccur"     -> qCooccurSql,
    "q_dataset_card" -> qDatasetCardSql,
    "q_bigram_novelty" -> qBigramNoveltySql,
    "q_bigram_lm"   -> qBigramLmSql,
    "q_vocab_growth" -> qVocabGrowthSql,
    "q_vocab_coverage" -> qVocabCoverageSql,
    "q_repetition"  -> qRepetitionSql,
    "q_bm25"        -> qBm25Sql,
    "q_inverted"    -> qInvertedSql,
    "q_redact"      -> qRedactSql,
    "q_vocab"       -> qVocabSql,
    "q_readability" -> qReadabilitySql,
    "q_zipf"        -> qZipfSql,
    "q_text_stats"  -> qTextStatsSql,
    "q_lang_id"     -> qLangIdSql,
    "q_langid_confusion" -> qLangidConfusionSql,
    "q_oov_rate"    -> qOovRateSql,
    "q_token_count" -> qTokenCountSql,
    "q_fingerprint" -> qFingerprintSql,
    "q_chunk"       -> qChunkSql,
    "q_curate"      -> qCurateSql,
    "q_split"       -> qSplitSql,
    "q_leakage"     -> qLeakageSql,
    "q_pack"        -> qPackSql,
    "q_contamination" -> qContaminationSql,
    "q_stratified"  -> qStratifiedSql,
    "q_tfidf"       -> qTfidfSql,
    "q_weighted_sample" -> qWeightedSampleSql
  )
}
