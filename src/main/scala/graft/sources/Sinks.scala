package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.functions.col

/** Sink wiring. The reference ships only `print()`
  * (`DebeziumTransactionReconstructor.java:92`, "replace with your
  * sink"); these are the replacements a production deployment needs,
  * plus the dead-letter split that makes the reference's never-consumed
  * `invalid-events` side output (`:133,151,167`) real.
  */
object Sinks {

  /** Console sink — parity with the reference's `print()`. */
  def console[T](ds: Dataset[T]): DataStreamWriter[T] =
    ds.writeStream.format("console").outputMode("append")

  /** Parquet sink with checkpointing — the durable default. Checkpoint
    * interval ≈ trigger cadence (the reference checkpoints every 60 s,
    * `:37`).
    */
  def parquet[T](ds: Dataset[T], path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : DataStreamWriter[T] =
    ds.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .outputMode("append")

  /** Dead-letter split via foreachBatch: rows with a null payload go to
    * the dead-letter path, parsed rows to the main path — both written
    * exactly-once per micro-batch from one pass over the batch.
    */
  def withDeadLetter(parsed: DataFrame, mainPath: String,
      deadPath: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    parsed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // cache: one source read serves both splits
        batch.persist()
        try {
          batch.filter(col("payload").isNotNull)
            .write.mode("append").parquet(mainPath)
          batch.filter(col("payload").isNull).select(col("value"))
            .write.mode("append").parquet(deadPath)
        } finally batch.unpersist()
        ()
      }
}
