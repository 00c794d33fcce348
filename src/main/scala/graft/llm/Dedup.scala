package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard.
  *
  * All hash arithmetic is explicit (polynomial char hash mod 1e9+7)
  * rather than engine-native murmur/xxhash, so the DuckDB oracle can
  * reproduce results bit-for-bit. The plan shapes are the ones that
  * scale:
  *  - exact dedup: map-side fingerprint → one hash aggregation;
  *  - MinHash LSH: explode tokens → per-doc signature (one partial
  *    agg) → band keys → self-join *only within band buckets* (the
  *    candidate set is the join output, never the full cross product);
  *  - SimHash: map-only signature, pairable by prefix buckets;
  *  - n-gram Jaccard: blocked pairwise compare (here blocked by `lang`;
  *    at 100 TB the block key would be an LSH band).
  */
object Dedup {

  /** Deterministic polynomial hash of a token:
    * fold(7, (acc, ch) => (acc * 31 + codepoint(ch)) mod 1e9+7).
    */
  private val P = 1000000007L

  def tokenHash(t: Column): Column =
    aggregate(
      split(t, ""),
      lit(7L),
      (acc, c) => (acc * 31 + ascii(c)) % P)

  private def tokHashSql(t: String): String =
    s"""list_reduce(list_prepend(CAST(7 AS BIGINT),
       |      list_transform(string_split_regex($t, ''),
       |                     c -> CAST(ascii(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  // -------------------------------------------------------- q_dedup_exact
  /** Exact dedup via canonical fingerprint: one row per distinct
    * normalized text, keeping the smallest doc_id as canonical.
    */
  private def qDedupExact(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))

  private val qDedupExactSql: String =
    """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
      |  min(doc_id) AS canonical_doc_id,
      |  count(*) AS n_copies
      |FROM documents
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------- q_minhash_lsh
  /** MinHash signatures + LSH banding: candidate near-dup pairs are
    * docs sharing at least one band bucket.
    *
    * K = 8 hash functions h_i(x) = ((2i+1)·x + 12345·i) mod P over the
    * token hash; 4 bands × 2 rows. Output: distinct candidate pairs.
    */
  private val K = 8
  private val ROWS_PER_BAND = 2

  /** Word n-gram shingles (distinct, lowercased). MinHash over
    * *shingles*, not unigram token sets: with a small vocabulary every
    * document contains every token, so unigram sets are identical and
    * LSH degenerates to the full cross product — shingles keep sets
    * distinctive (the textbook construction).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val tk = split(lower(text), " ")
    when(size(tk) >= n,
      array_distinct(transform(sequence(lit(0), size(tk) - n),
        i => concat_ws(" ", slice(tk, i + 1, lit(n))))))
      .otherwise(typedlit(Seq.empty[String]))
  }

  private def shingleSql(inner: String): String =
    s"""SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(tk) - 2), i -> array_to_string(tk[i+1:i+3], ' '))))
       |    AS t
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |        FROM $inner)""".stripMargin

  /** All shingles (no string-level distinct — dedup happens on the hash
    * value downstream, mirroring the engine).
    */
  private def shingleAllSql(inner: String): String =
    s"""SELECT doc_id, unnest(list_transform(
       |    range(len(tk) - 2), i -> array_to_string(tk[i+1:i+3], ' ')))
       |    AS t
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
       |        FROM $inner)""".stripMargin

  /** Per-doc MinHash signature columns sig0..sig{K-1}, computed in ONE
    * aggregation pass (K min-aggregates over the shingle-hash stream —
    * map-side partial min, single shuffle on doc_id; no K× row
    * explosion).
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    graft.functions.ShinglePolyHash.register(docs.sparkSession)
    // Shingle hashes straight off the token array (no shingle strings
    // materialized, ShinglePolyHash scaladoc). min() is insensitive to
    // duplicates, so no distinct pass is needed either.
    val tok = docs.select(col("doc_id"),
      explode(graft.functions.ShinglePolyHash.shingle_hashes(
        split(lower(col("text")), " "), lit(3))).as("h"))
    val aggs = (0 until K).map(i =>
      min((col("h") * (i * 2 + 1) + i * 12345L) % P).as(s"sig$i"))
    tok.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private def qMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val sigs = minhashSignatures(Tables.documents(s, d))
    val bandStructs = (0 until K / ROWS_PER_BAND).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until ROWS_PER_BAND)
          .map(r => col(s"sig${b * ROWS_PER_BAND + r}")): _*).as("key"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  private val qMinhashLshSql: String =
    s"""WITH tok AS (
       |  ${shingleSql("documents")}),
       |th AS (
       |  SELECT doc_id, ${tokHashSql("t")} AS h FROM tok),
       |mh AS (
       |  SELECT doc_id, i,
       |    min((h * (i * 2 + 1) + i * 12345) % 1000000007) AS sig
       |  FROM th, range($K) r(i)
       |  GROUP BY doc_id, i),
       |bands AS (
       |  SELECT doc_id, i // $ROWS_PER_BAND AS band,
       |    string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS key
       |  FROM mh GROUP BY doc_id, i // $ROWS_PER_BAND)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a
       |JOIN bands b ON a.band = b.band AND a.key = b.key
       |            AND a.doc_id < b.doc_id""".stripMargin

  // ----------------------------------------------------------- q_simhash
  /** 16-bit SimHash per document from token hashes: bit b is the sign
    * of sum over tokens of ±1 by token-hash bit b.
    */
  private val BITS = 16

  private def qSimhash(s: SparkSession, d: String): DataFrame = {
    graft.functions.ShinglePolyHash.register(s)
    // SimHash sums ±1 per DISTINCT shingle — dedupe by hash (both the
    // engine and the oracle dedupe on the hash value, so a same-doc
    // hash collision cannot cause a cross-engine mismatch).
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.ShinglePolyHash
          .shingle_hashes(split(lower(col("text")), " "), lit(3))))
          .as("h"))
    val bitCols = (0 until BITS).map { b =>
      sum(shiftright(col("h"), b) % 2 * 2 - 1).as(s"s$b")
    }
    val sim = (0 until BITS)
      .map(b => when(col(s"s$b") >= 0, 1L << b).otherwise(0L))
      .reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"), sim.as("simhash"))
  }

  private val qSimhashSql: String = {
    val bitSums = (0 until BITS)
      .map(b => s"SUM((h >> $b) % 2 * 2 - 1) AS s$b").mkString(",\n    ")
    val sim = (0 until BITS)
      .map(b => s"CASE WHEN s$b >= 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  ${shingleAllSql("documents")}),
       |th AS (
       |  SELECT DISTINCT doc_id, ${tokHashSql("t")} AS h FROM tok),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM th GROUP BY doc_id)
       |SELECT doc_id, CAST($sim AS BIGINT) AS simhash FROM bits""".stripMargin
  }

  // ----------------------------------------------------- q_ngram_jaccard
  /** Blocked pairwise token-set Jaccard: probe docs (doc_id % 50 == 0)
    * against all same-lang docs. The block key bounds the pair count —
    * the same structure as LSH-bucketed verification at scale.
    */
  private def qNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        array_distinct(split(lower(col("text")), " ")).as("toks"))
    val probes = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("doc_a"), col("lang"),
        col("toks").as("toks_a"))
    probes
      .join(docs.select(col("doc_id").as("doc_b"), col("lang"),
        col("toks").as("toks_b")), Seq("lang"))
      .filter(col("doc_a") < col("doc_b"))
      .select(
        col("lang"), col("doc_a"), col("doc_b"),
        size(array_intersect(col("toks_a"), col("toks_b")))
          .cast(IntegerType).as("n_common"),
        (size(array_intersect(col("toks_a"), col("toks_b"))).cast("double")
          / (size(col("toks_a")) + size(col("toks_b"))
            - size(array_intersect(col("toks_a"), col("toks_b")))))
          .as("jaccard")
      )
  }

  private val qNgramJaccardSql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang,
      |    list_distinct(string_split(lower(text), ' ')) AS toks
      |  FROM documents)
      |SELECT a.lang AS lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x)))
      |       AS INTEGER) AS n_common,
      |  CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x)))
      |       AS DOUBLE)
      |    / (len(a.toks) + len(b.toks)
      |       - len(list_filter(a.toks, x -> list_contains(b.toks, x))))
      |    AS jaccard
      |FROM docs a
      |JOIN docs b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE a.doc_id % 50 = 0""".stripMargin

  // ----------------------------------------------------- q_levenshtein
  /** Edit-distance near-dup detection, blocked pairwise: probe parts
    * (p_partkey % 10 == 0) against same-(p_type, p_size)-block parts,
    * then exact Levenshtein ≤ 6 confirms. The block key bounds the
    * quadratic term — the same role LSH bands play for MinHash; at
    * 100 TB the block would be an LSH bucket and this the verify stage.
    */
  private def qLevenshtein(s: SparkSession, d: String): DataFrame = {
    val pr = Tables.part(s, d)
      .select(col("p_partkey"), col("p_type"), col("p_size"), col("p_name"))
    pr.filter(col("p_partkey") % 10 === 0).alias("a")
      .join(pr.alias("b"),
        col("a.p_type") === col("b.p_type") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("dist",
        levenshtein(col("a.p_name"), col("b.p_name")).cast(IntegerType))
      .filter(col("dist") <= 6)
      .select(col("a.p_type").as("p_type"), col("a.p_size").as("p_size"),
        col("a.p_partkey").as("part_a"), col("b.p_partkey").as("part_b"),
        col("dist"))
  }

  private val qLevenshteinSql: String =
    """SELECT a.p_type AS p_type, a.p_size AS p_size,
      |  a.p_partkey AS part_a, b.p_partkey AS part_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
      |FROM part a
      |JOIN part b ON a.p_type = b.p_type AND a.p_size = b.p_size
      |           AND a.p_partkey < b.p_partkey
      |WHERE a.p_partkey % 10 = 0
      |  AND levenshtein(a.p_name, b.p_name) <= 6""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact"   -> qDedupExact _,
    "q_minhash_lsh"   -> qMinhashLsh _,
    "q_simhash"       -> qSimhash _,
    "q_ngram_jaccard" -> qNgramJaccard _,
    "q_levenshtein"   -> qLevenshtein _
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact"   -> qDedupExactSql,
    "q_minhash_lsh"   -> qMinhashLshSql,
    "q_simhash"       -> qSimhashSql,
    "q_ngram_jaccard" -> qNgramJaccardSql,
    "q_levenshtein"   -> qLevenshteinSql
  )
}
