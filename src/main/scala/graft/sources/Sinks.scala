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

  /** Streaming keyed upsert into an on-disk snapshot table — the
    * MERGE-style sink that turns `streaming/LatestState`'s Update-mode
    * rows into a queryable current-state TABLE (the CDC-mirror
    * endgame the reference's `print()` stands in for).
    *
    * Mechanics: each micro-batch merges its snapshot rows with the
    * newest COMMITTED table version by last-writer-wins
    * (`max_by` on (last_ts, last_event_id) — the same winner rule the
    * stateful operator applies, re-applied here so the merge is safe
    * even against a table restored from an older backup), then writes
    * the full merged snapshot to `version=<batchId>/`.
    *
    * Exactly-once: a retried batch reads only versions STRICTLY BELOW
    * its own id (its previous partial output is invisible) and
    * mode=overwrite replaces that partial output in place — replays
    * converge to byte-identical tables. Older versions are pruned
    * best-effort after a successful write; [[readSnapshot]] always
    * resolves the newest remaining version.
    *
    * Scale: each version is a full rewrite of the snapshot (bounded by
    * KEY cardinality, not event volume — the state operator already
    * compacted the stream). That is the right trade while snapshots
    * are ≪ event logs; once the snapshot itself is TBs, swap the
    * directory-version dance for a table format with native MERGE
    * (Delta/Iceberg) — the streaming side of this sink is unchanged.
    */
  def upsertSnapshot(snapshots: Dataset[graft.streaming.LatestState.Snapshot],
      tablePath: String, checkpoint: String)
      : DataStreamWriter[graft.streaming.LatestState.Snapshot] =
    snapshots.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch {
        (batch: Dataset[graft.streaming.LatestState.Snapshot],
         batchId: Long) =>
          val spark = batch.sparkSession
          import org.apache.spark.sql.functions._
          val prior = committedVersions(spark, tablePath)
            .filter(_ < batchId).sorted.lastOption
          val prev = prior.map(v =>
            spark.read.parquet(s"$tablePath/version=$v"))
          val all = prev.fold(batch.toDF)(batch.toDF.unionByName(_))
          val cols = Seq("user_id", "last_event_id", "last_ts",
            "last_type", "last_value")
          all
            .groupBy(col("user_id"))
            .agg(max_by(struct(cols.map(col): _*),
              struct(col("last_ts"), col("last_event_id"))).as("s"))
            .select(col("s.*"))
            .write.mode("overwrite")
            .parquet(s"$tablePath/version=$batchId")
          // prune superseded versions (best effort — readers resolve
          // the max version, so a leftover older dir is only disk)
          committedVersions(spark, tablePath).filter(_ < batchId)
            .foreach { v =>
              try deletePath(spark, s"$tablePath/version=$v")
              catch { case _: Throwable => () }
            }
          ()
      }

  /** Fixed-delay restart supervision (SURVEY §2.1 O1) — the in-code
    * analog of the reference's
    * `RestartStrategies.fixedDelayRestart(3, 10 s)`
    * (`DebeziumTransactionReconstructor.java:36`): run the query to
    * termination and, on failure, restart it up to `retries` times
    * with `delayMs` between attempts. `start` must build a FRESH query
    * each attempt over the SAME checkpoint location — Spark then
    * resumes from the last committed offsets, exactly like a Flink
    * restart from the last checkpoint; with an idempotent sink (see
    * [[withDeadLetter]]/[[upsertSnapshot]]) the replayed batch
    * overwrites any partial output.
    *
    * Returns the number of restarts consumed on eventual success;
    * rethrows the final failure once retries are exhausted.
    */
  def supervise(start: () => StreamingQuery, retries: Int = 3,
      delayMs: Long = 10000L): Int = {
    var attempt = 0
    while (true) {
      val q = start()
      try {
        q.awaitTermination()
        return attempt
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          if (attempt >= retries) throw e
          attempt += 1
          Thread.sleep(delayMs)
      }
    }
    attempt // unreachable
  }

  /** The newest committed snapshot version under `tablePath`. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): DataFrame = {
    val vs = committedVersions(spark, tablePath)
    require(vs.nonEmpty, s"no snapshot versions under $tablePath")
    spark.read.parquet(s"$tablePath/version=${vs.max}")
  }

  /** Version ids with a parquet `_SUCCESS` marker (a crashed write has
    * no marker and is invisible to readers and merges).
    */
  private def committedVersions(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Seq[Long] = {
    val hpath = new org.apache.hadoop.fs.Path(tablePath)
    val fs = hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hpath)) Seq.empty
    else fs.listStatus(hpath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("version=") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("version=").toLong)
  }

  private def deletePath(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val hpath = new org.apache.hadoop.fs.Path(path)
    hpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hpath, true)
    ()
  }
}
