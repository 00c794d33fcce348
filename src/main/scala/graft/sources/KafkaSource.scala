package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka ingestion wiring — the Spark form of the reference's sources
  * (`DebeziumTransactionReconstructor.java:47-65`;
  * `...WithEventCorrelation.java:55-71`).
  *
  * The reference consumes topics as plain strings
  * (`SimpleStringSchema`); here each source yields a single `value`
  * string column feeding [[graft.ingest.DebeziumParser]].
  *
  * Scale: Kafka partitions map 1:1 to Spark input partitions;
  * `minPartitions` can oversubscribe when topic partitioning is coarser
  * than the cluster. Offsets are tracked in the checkpoint — the
  * exactly-once analog of the reference's 60 s checkpointing
  * (`:37`).
  */
object KafkaSource {

  /** Fixed-topic subscription (`.setTopics`, `:53,65`). */
  def subscribe(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** Pattern subscription — multi-table capture
    * (`.setTopicPattern("mysql-server.db_1.*")`,
    * `...WithEventCorrelation.java:56`).
    */
  def subscribePattern(spark: SparkSession, bootstrap: String,
      pattern: String, startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribePattern", pattern)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** The reference's concrete wiring: change-event topic +
    * transaction-metadata topic on one cluster
    * (`kafka:9092`, `:47-49`).
    */
  def referencePipelineSources(spark: SparkSession,
      bootstrap: String = "kafka:9092"): (DataFrame, DataFrame) =
    (subscribePattern(spark, bootstrap, "mysql-server\\.db_1\\..*"),
      subscribe(spark, bootstrap, "mysql-server.transaction"))
}
