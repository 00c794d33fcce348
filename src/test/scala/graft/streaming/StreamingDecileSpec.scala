package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Online-decile parity: boundaries derived from a batch snapshot cut,
  * broadcast into the stateless scoring stream, must reproduce the
  * batch rank-cut decile for every user whenever scores are distinct
  * (the one case where a rank split and a value split can disagree is
  * equal scores straddling a boundary — the documented difference of
  * the online form, pinned separately below).
  */
case class Scored(user_id: Long, score: Long)

class StreamingDecileSpec extends SparkSpec {
  import spark.implicits._

  test("streamed assignment reproduces the batch rank cut on distinct scores") {
    implicit val sqlCtx = spark.sqlContext

    // One user per DISTINCT activity count from the real corpus —
    // distinct scores make the rank cut and the value cut identical.
    val users = Tables.events(spark, sf())
      .groupBy(col("user_id")).agg(count(lit(1)).as("score"))
      .groupBy(col("score")).agg(min(col("user_id")).as("user_id"))
      .select(col("user_id"), col("score"))
    val cut = users.withColumn("decile",
      ntile(10).over(Window.orderBy(col("score").desc, col("user_id")))
        .cast("int"))
    val bounds = StreamingDecile.boundaries(cut)
    val batchDecile = cut.collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    // sf0.001 has ~13 distinct activity counts — enough to populate
    // (most of) the 10 deciles, which is what the parity needs
    assert(batchDecile.size >= 10)

    val rows = cut.select(col("user_id"), col("score")).as[Scored].collect()
    val input = MemoryStream[Scored]
    val out = StreamingDecile.assign(input.toDF(), bounds)
    val q = out.writeStream.format("memory").queryName("sdecile")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("sdecile").collect()
        .map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(streamed.size == rows.length)
      val diff = batchDecile.collect {
        case (u, d) if streamed(u) != d => (u, d, streamed(u))
      }
      assert(diff.isEmpty, s"first mismatches: ${diff.take(3)}")
    } finally q.stop()

    // Scores the snapshot never saw: below every boundary → decile 10
    // (the "new, inactive user" bucket); above every boundary → decile 1.
    val fresh = StreamingDecile.assign(
      Seq(Scored(900001L, -5L), Scored(900002L, Long.MaxValue)).toDF(),
      bounds)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(fresh(900001L) == 10 && fresh(900002L) == 1)
  }

  test("equal scores always value-split consistently (the documented deviation)") {
    // Two users tie at a score that IS a decile minimum: the online
    // form must put BOTH at that boundary's decile (value split),
    // deterministically — never one on each side as a rank split would.
    val cut = (1 to 100)
      .map(i => (i.toLong, (101 - i).toLong, (i - 1) / 10 + 1))
      .toDF("user_id", "score", "decile")
      .select(col("user_id"), col("score"), col("decile").cast("int")
        .as("decile"))
    val bounds = StreamingDecile.boundaries(cut)
    // decile 3 covers scores 71..80 here; stream two users tied at 71
    val out = StreamingDecile.assign(
      Seq(Scored(901L, 71L), Scored(902L, 71L)).toDF(), bounds)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(901L) == 3 && out(902L) == 3)
  }
}
