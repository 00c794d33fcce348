package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming MERGE semantics: tombstone deletes, no-resurrection on
  * late replays, and convergence to the batch q_merge result over an
  * out-of-order batch split of the full corpus.
  */
class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._
  import LatestState.EventRow
  import StreamingMerge.merged

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("delete emits a tombstone; a late pre-delete event cannot resurrect") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = merged(input.toDS()).writeStream.format("memory")
      .queryName("merge_t").outputMode(StreamingMerge.outputMode).start()
    try {
      input.addData(EventRow(10L, ts(1), 1L, "A", 1.0))
      q.processAllAvailable()
      input.addData(EventRow(11L, ts(5), 1L, "error", 0.0))
      q.processAllAvailable()
      val afterDelete = spark.table("merge_t").collect()
        .filter(_.getLong(0) == 1L).maxBy(r => (r.getTimestamp(2).getTime,
          r.getLong(1)))
      assert(afterDelete.getBoolean(5), "delete must emit deleted=true")

      // late replay of an event OLDER than the tombstone: must re-emit
      // the tombstone, never resurrect A
      input.addData(EventRow(9L, ts(3), 1L, "B", 2.0))
      q.processAllAvailable()
      val rows = spark.table("merge_t").collect().filter(_.getLong(0) == 1L)
      val fin = rows.maxBy(r => (r.getTimestamp(2).getTime, r.getLong(1)))
      assert(fin.getBoolean(5) && fin.getLong(1) == 11L,
        "tombstone must keep winning over older late arrivals")

      // a genuinely NEWER upsert revives the key
      input.addData(EventRow(12L, ts(7), 1L, "C", 3.0))
      q.processAllAvailable()
      val fin2 = spark.table("merge_t").collect()
        .filter(_.getLong(0) == 1L)
        .maxBy(r => (r.getTimestamp(2).getTime, r.getLong(1)))
      assert(!fin2.getBoolean(5) && fin2.getString(3) == "C")
    } finally q.stop()
  }

  test("converges to batch q_merge over an out-of-order 3-batch split") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, sf())
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRow].collect()
    val input = MemoryStream[EventRow]
    val q = merged(input.toDS()).writeStream.format("memory")
      .queryName("merge_par").outputMode(StreamingMerge.outputMode).start()
    try {
      // split by event_id mod 3 — deliberately NOT time-ordered, so
      // convergence exercises the out-of-order path
      (0 to 2).foreach { k =>
        input.addData(ev.filter(_.event_id % 3 == k).toSeq)
        q.processAllAvailable()
      }
      val fin = spark.table("merge_par").collect()
        .groupBy(_.getLong(0)).map { case (_, rs) =>
          rs.maxBy(r => (r.getTimestamp(2).getTime, r.getLong(1)))
        }
      val live = fin.filterNot(_.getBoolean(5))
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getString(3), r.getDouble(4))).toSet
      val batch = graft.cdc.Scd.queries("q_merge")(spark, sf()).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getString(3), r.getDouble(4))).toSet
      assert(live == batch,
        s"streaming merge diverged: ${live.size} vs ${batch.size} rows")
      // every key seen in the stream is either live or tombstoned
      assert(fin.size == ev.map(_.user_id).distinct.length)
    } finally q.stop()
  }
}
