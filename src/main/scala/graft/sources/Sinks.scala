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
    * the dead-letter path, parsed rows to the main path.
    *
    * Idempotent per micro-batch: each batch writes (mode=overwrite) into
    * its own `batch_id=<id>` subdirectory, so a batch retried after a
    * partial failure replaces its previous partial output instead of
    * appending duplicates — effectively exactly-once for any reader of
    * the directory tree (`spark.read.parquet(mainPath)` sees `batch_id`
    * as a discovered partition column).
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
            .write.mode("overwrite").parquet(s"$mainPath/batch_id=$batchId")
          batch.filter(col("payload").isNull).select(col("value"))
            .write.mode("overwrite").parquet(s"$deadPath/batch_id=$batchId")
        } finally batch.unpersist()
        ()
      }
}
