package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-day register parity: after streaming the sf0.001 events corpus
  * in three batches — with an overlapping replay — the (day, register)
  * table equals the batch derivation of the whole corpus, and each
  * day's register set stays ≤ 64 rows (the calendar-bounded state
  * claim). Register-wise max across a day window then serves the
  * trailing WAU/MAU estimates, the documented warehouse swap for
  * q_active_users' exact expansion.
  */
class StreamingDauSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.PolyHash.register(spark)

  private case class Ev(user_id: Long, ts: java.sql.Timestamp)

  test("streamed per-day registers equal the batch sketch, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(rows.length > 500)

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingDau.registers(
        input.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("dau_regs")
      .outputMode("update").start()
    try {
      val third = (rows.length + 2) / 3
      input.addData(rows.take(2 * third).toIndexedSeq)
      q.processAllAvailable()
      // overlapping replay of the middle third
      input.addData(rows.slice(third, 2 * third).toIndexedSeq)
      q.processAllAvailable()
      input.addData(rows.drop(2 * third).toIndexedSeq)
      q.processAllAvailable()

      // Update mode re-emits rows as registers grow: latest = max
      val streamed = spark.table("dau_regs").collect()
        .groupBy(r => (r.getLong(0), r.getLong(1)))
        .map { case (k, rs) => k -> rs.map(_.getLong(2)).max }

      val batch = StreamingDau.registers(
          rows.toSeq.toDF("user_id", "ts"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      assert(streamed == batch)
      // calendar-bounded state: ≤64 registers per active day
      val perDay = batch.keySet.groupBy(_._1).view.mapValues(_.size)
      assert(perDay.values.forall(_ <= 64))
      assert(perDay.size > 5) // multiple active days exercised

      // Trailing ×7/×28 merge off the LIVE store == the oracle-checked
      // batch query's estimate columns, day for day. The streamed
      // register table (latest max per (day, j)) is what a serving job
      // reads; q_active_users_hll is the batch recompute of the same
      // corpus — the two must agree exactly, including on the replayed
      // (at-least-once) delivery above.
      val store = streamed.toSeq
        .map { case ((day, j), m) => (day, j, m) }
        .toDF("day", "j", "m_j")
      def est(w: Int, out: String): Map[Long, Long] =
        StreamingDau.trailingEstimates(store, w, out)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val live7 = est(7, "est_wau"); val live28 = est(28, "est_mau")
      val liveDau = est(1, "est_dau")
      val batchQ = graft.llm.Sketches
        .queries("q_active_users_hll")(spark, sf())
        .select(col("day"), col("est_dau"), col("est_wau"),
          col("est_mau"))
        .collect()
      assert(batchQ.nonEmpty)
      batchQ.foreach { r =>
        val day = r.getLong(0)
        assert(liveDau(day) == r.getLong(1), s"est_dau day $day")
        assert(live7(day) == r.getLong(2), s"est_wau day $day")
        assert(live28(day) == r.getLong(3), s"est_mau day $day")
      }
    } finally q.stop()
  }
}
