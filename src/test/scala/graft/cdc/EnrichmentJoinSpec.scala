package graft.cdc

import graft.SparkSpec
import graft.ingest.DebeziumParser
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream enrichment join: both arrival orders must correlate
  * (the behavior the reference's pipeline 2 loses, SURVEY.md §2.2 J2).
  */
class EnrichmentJoinSpec extends SparkSpec {
  import spark.implicits._

  private def change(txn: String, ts: Long): String =
    s"""{"payload": {"op": "u", "ts_ms": $ts,
       |  "transaction": {"id": "$txn"},
       |  "before": null, "after": {"v": $ts}}}""".stripMargin
  private def end(txn: String, n: Long): String =
    s"""{"payload": {"status": "END", "id": "$txn", "event_count": $n}}"""

  test("batch correlate: inner join on transactionId with END metadata") {
    val (c, t, _) = DebeziumParser.parseAndSplit(spark.createDataset(Seq(
      change("t1", 10), change("t1", 20), change("t2", 30),
      end("t1", 2),
      """{"payload": {"status": "BEGIN", "id": "t2", "event_count": null}}"""
    )))
    val out = EnrichmentJoin.correlate(c, t).collect()
    assert(out.length == 2) // t2 has no END → not enriched
    assert(out.forall(_.metadata.status == "END"))
    assert(out.map(_.changeEvent.tsMs).sorted.toSeq == Seq(10L, 20L))
  }

  test("streaming: metadata arriving after events still correlates") {
    implicit val sqlCtx = spark.sqlContext
    val changes = MemoryStream[String]
    val txns = MemoryStream[String]
    val (c, _, _) = DebeziumParser.parseAndSplit(changes.toDS())
    val (_, t, _) = DebeziumParser.parseAndSplit(txns.toDS())
    // watermark both sides via an event-time column so join state is
    // evictable (unbounded-state guard at scale)
    val cw = c.withColumn("ts", timestamp_millis(col("tsMs")))
      .withWatermark("ts", "1 minute")
    val tw = t.withColumn("ts", timestamp_millis(lit(0L)))
    val joined = cw.join(tw, "transactionId")
    val q = joined.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      changes.addData(change("t7", 100), change("t7", 200)) // events first
      q.processAllAvailable()
      assert(spark.table("enrich").count() == 0) // no metadata yet
      txns.addData(end("t7", 2)) // metadata second — reference drops this
      q.processAllAvailable()
      assert(spark.table("enrich").count() == 2) // we don't
    } finally q.stop()
  }
}
