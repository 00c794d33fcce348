package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every SQL-expressible
  * query has a DuckDB oracle with identical column names/aliases (the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (cdc.BatchReconstruction.queries, cdc.BatchReconstruction.oracles),
    (cdc.Scd.queries, cdc.Scd.oracles),
    (ops.RelationalQueries.queries, ops.RelationalQueries.oracles),
    (ops.Operational.queries, ops.Operational.oracles),
    (ops.Graph.queries, ops.Graph.oracles),
    (ops.Tpch.queries, ops.Tpch.oracles),
    (ops.ModernSql.queries, ops.ModernSql.oracles),
    (ops.LayoutAudit.queries, ops.LayoutAudit.oracles),
    (llm.TextAnalysis.queries, llm.TextAnalysis.oracles),
    (llm.Dedup.queries, llm.Dedup.oracles),
    (llm.Similarity.queries, llm.Similarity.oracles),
    (llm.Embeddings.queries, llm.Embeddings.oracles),
    (llm.Mixing.queries, llm.Mixing.oracles),
    (llm.Multimodal.queries, llm.Multimodal.oracles),
    (llm.Sketches.queries, llm.Sketches.oracles),
    (llm.Tokenization.queries, llm.Tokenization.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    cdc.BatchReconstruction.reconstruct(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap
}
