package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-compression operators: random-projection dimensionality
  * reduction and product-quantization encoding — the two transforms a
  * 100 TB embedding store applies before anything else touches it
  * (a 64-dim float32 corpus is 256 B/row; the 8-dim projection is
  * 64 B and the PQ code is 8 B).
  *
  * Both are map-only: no shuffle, no UDF, all arithmetic inside
  * codegen'd higher-order functions. Exactness discipline (same as
  * `Similarity`): components are quantized to BIGINT via
  * `floor(x * 1e6)` first, and every downstream sum/distance is
  * integer — bit-identical across engines and across cluster
  * topologies (integer addition commutes; float folds don't).
  *
  * Reference provenance: the reference engine has no vector surface
  * at all (`/root/reference/readme.md:1-5` — a 2-pipeline CDC ETL);
  * these extend the LLM-pipeline surface SURVEY.md §2.3 mandates.
  */
object Embeddings {

  /** Input dim (embeddings table, `TESTDATA.md`). */
  private val DIM = 64

  // -------------------------------------------------------------- q_rproj
  /** Signed random projection 64 → 8 dims. Sign matrix entry (i, j) is
    * derived from the same deterministic Knuth-hash stream as the
    * `Similarity` hyperplanes: s(i,j) = +1 iff
    * (((i+1)·(j+1)·2654435761) mod 1000003) is even, else −1 —
    * identical integer arithmetic on both engines, no stored model
    * artifact. Johnson–Lindenstrauss sign projections preserve inner
    * products in expectation; at scale this is the cheap first-pass
    * filter in front of exact re-ranking.
    *
    * Map-only; the projection "matrix" is folded into the codegen'd
    * expression (64×8 = 512 multiply-adds per row), so the plan is a
    * single WholeStageCodegen project over the scan.
    */
  private val RPROJ_OUT = 8

  /** Spark-SQL expr: BIGINT quantized view of the embedding. */
  private val qvec =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  private def qRproj(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).withColumn("q", expr(qvec))
    val projCols = (0 until RPROJ_OUT).map { j =>
      expr(
        s"""aggregate(sequence(0, ${DIM - 1}), CAST(0 AS BIGINT),
           |  (acc, i) -> acc +
           |    (CASE WHEN (((i + 1) * ${j + 1} * 2654435761) % 1000003) % 2 = 0
           |          THEN 1 ELSE -1 END) * element_at(q, i + 1))""".stripMargin)
        .as(s"p$j")
    }
    e.select(col("vec_id") +: projCols: _*)
  }

  private val qRprojSql: String = {
    val cols = (0 until RPROJ_OUT).map { j =>
      s"""  CAST(list_sum(list_transform(range(0, $DIM),
         |    i -> (CASE WHEN (((i + 1) * ${j + 1} * 2654435761) % 1000003) % 2 = 0
         |          THEN 1 ELSE -1 END)
         |      * CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)))
         |    AS BIGINT) AS p$j""".stripMargin
    }.mkString(",\n")
    s"SELECT vec_id,\n$cols\nFROM embeddings"
  }

  // ----------------------------------------------------------------- q_pq
  /** Product-quantization encode: the 64-dim vector is split into 8
    * subvectors of 8 dims; each subvector is snapped to the nearest of
    * 4 per-subspace centroids (squared-L2 in the BIGINT-quantized
    * space, ties to the lowest centroid id — `array_position` and
    * DuckDB's `list_position` both return the FIRST occurrence of the
    * minimum, so the tie-break is identical by construction). Output
    * is the 8-byte code word plus the total quantization error.
    *
    * Centroids are deterministic integers from the same hash stream,
    * qc(c,i) = ((c+1)·(i+17)·2654435761 mod 1000003) − 500001, spanning
    * the quantized data range (±5·10⁵) — the encode MECHANICS (the part
    * with a distributed-systems story) are what's exercised; a trained
    * codebook would arrive as a broadcast literal the same way.
    * Overflow-safe: per-dim diff ≤ ~1.5·10⁶, squared ≤ 2.3·10¹², ×8
    * dims ≤ 1.8·10¹³ ≪ 2⁶³.
    *
    * Map-only single-pass: the 8×4 distance matrix is one nested HOF
    * expression evaluated once per row (`dmat`), argmin + error both
    * read it from the same projection — no recompute, no shuffle.
    */
  private val PQ_SUBS = 8  // subvectors
  private val PQ_K    = 4  // centroids per subspace
  private val PQ_SUBDIM = DIM / PQ_SUBS

  /** Integer centroid component formula, shared verbatim by both
    * engines (i is the 0-based FULL-vector dim index).
    */
  private def centroid(c: String, i: String): String =
    s"((($c + 1) * ($i + 17) * 2654435761) % 1000003) - 500001"

  private def qPq(s: SparkSession, d: String): DataFrame = {
    val dmat =
      s"""transform(sequence(0, ${PQ_SUBS - 1}), b ->
         |  transform(sequence(0, ${PQ_K - 1}), c ->
         |    aggregate(sequence(0, ${PQ_SUBDIM - 1}), CAST(0 AS BIGINT),
         |      (acc, k) -> acc +
         |        (element_at(q, b * $PQ_SUBDIM + k + 1)
         |          - (${centroid("c", s"b * $PQ_SUBDIM + k")}))
         |        * (element_at(q, b * $PQ_SUBDIM + k + 1)
         |          - (${centroid("c", s"b * $PQ_SUBDIM + k")})))))""".stripMargin
    Tables.embeddings(s, d)
      .withColumn("q", expr(qvec))
      .withColumn("dmat", expr(dmat))
      .select(
        col("vec_id"),
        expr("array_join(transform(dmat, ds -> " +
          "CAST(array_position(ds, array_min(ds)) - 1 AS STRING)), '|')")
          .as("codes"),
        expr("aggregate(transform(dmat, ds -> array_min(ds)), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("quant_err"))
  }

  private val qPqSql: String = {
    val qv = "CAST(floor(CAST(embedding[b * %d + k + 1] AS DOUBLE) * 1000000) AS BIGINT)"
      .format(PQ_SUBDIM)
    s"""WITH dm AS (
       |  SELECT vec_id,
       |    list_transform(range(0, $PQ_SUBS), b ->
       |      list_transform(range(0, $PQ_K), c ->
       |        list_sum(list_transform(range(0, $PQ_SUBDIM), k ->
       |          ($qv - (${centroid("c", s"b * $PQ_SUBDIM + k")}))
       |          * ($qv - (${centroid("c", s"b * $PQ_SUBDIM + k")})))))) AS dmat
       |  FROM embeddings)
       |SELECT vec_id,
       |  array_to_string(list_transform(dmat,
       |    ds -> CAST(list_position(ds, list_min(ds)) - 1 AS VARCHAR)), '|') AS codes,
       |  CAST(list_sum(list_transform(dmat, ds -> list_min(ds))) AS BIGINT) AS quant_err
       |FROM dm""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rproj" -> qRproj _,
    "q_pq"    -> qPq _
  )

  val oracles: Map[String, String] = Map(
    "q_rproj" -> qRprojSql,
    "q_pq"    -> qPqSql
  )
}
