package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Batch interchange formats for training-data pipelines.
  *
  * The lingua franca of LLM corpus exchange is JSON Lines — one JSON
  * object per line, splittable, append-friendly — and partitioned
  * parquet for curated output. The reference has no batch I/O surface
  * at all (its only sink is `print()`,
  * `DebeziumTransactionReconstructor.java:92`); this is the surface a
  * user needs around the corpus operators.
  *
  * Scale rules encoded here:
  *  - JSONL reads take an EXPLICIT schema, never inference — schema
  *    inference is a full extra pass over the input (at 100 TB, a
  *    100 TB pre-read before the real read).
  *  - Malformed lines never kill the job and are never silently
  *    dropped: PERMISSIVE parse + corrupt-record capture splits them
  *    to a dead-letter frame, the same discipline as the Debezium
  *    dead-letter path ([[Sinks.withDeadLetter]]).
  *  - Curated output is partitioned parquet; readers filtering on the
  *    partition column touch only matching directories (partition
  *    pruning — proven by `InterchangeSpec`).
  */
object Interchange {

  /** Corrupt-record capture column. */
  val CorruptCol = "_corrupt_record"

  /** Write a frame as JSON Lines under `path` (one file per
    * partition; optionally gzip). JSONL is line-splittable even
    * compressed per-file, so downstream reads parallelize per file —
    * size output partitions accordingly upstream (repartition before
    * write controls file count).
    */
  def writeJsonl(df: DataFrame, path: String,
      compress: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** Schema-enforced JSONL read. No inference pass: `schema` is the
    * contract. Returns rows parsed in PERMISSIVE mode — malformed
    * lines yield null fields and are captured whole in [[CorruptCol]];
    * use [[readJsonlSplit]] to route them.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** JSONL read split into (good, deadLetter). The parsed frame is
    * cached before the split: Spark refuses to filter on the
    * corrupt-record column of a lazily re-parsed scan (the filter
    * would change what "corrupt" means on re-read), and the two
    * consumers would otherwise each re-parse the input.
    */
  def readJsonlSplit(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val parsed = readJsonl(spark, path, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val good = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw"))
    (good, bad)
  }

  /** Write curated output as parquet partitioned by `cols` — the
    * layout that makes per-language / per-source consumers touch only
    * their directories. Cardinality rule: partition columns must be
    * LOW-cardinality (lang, source, date); high-cardinality keys
    * belong in [[Layout.writeClustered]] bucketing instead (a
    * directory per key would be millions of tiny files).
    */
  def writePartitioned(df: DataFrame, path: String,
      cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
}
