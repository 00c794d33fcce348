package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Online HLL register parity: after any batch split — including an
  * OVERLAPPING replay — the streamed register table equals the batch
  * sketch of the union (max absorbs duplicates; a count-based distinct
  * aggregation would double-count the replay).
  */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.PolyHash.register(spark)

  test("streamed registers equal the batch sketch, replay-safe") {
    implicit val sqlCtx = spark.sqlContext
    val texts = (1L to 900L).map(i => s"online hll $i")
    val input = MemoryStream[String]
    val q = StreamingHll.registers(input.toDF().toDF("text"))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("update").start()
    try {
      input.addData(texts.take(400))
      q.processAllAvailable()
      // overlapping replay: rows 200..600 arrive again
      input.addData(texts.slice(200, 600))
      q.processAllAvailable()
      input.addData(texts.drop(600))
      q.processAllAvailable()
      val streamed = spark.table("hll_regs").collect()
        .groupBy(_.getLong(0))
        .map { case (j, rs) => j -> rs.map(_.getLong(1)).max }
      val batch = StreamingHll.registers(texts.toDF("text")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
      assert(batch.size <= 64)
      // and the register values match the shared Scala derivation
      val regs = scala.collection.mutable.Map[Long, Long]()
      texts.map(graft.llm.Sketches.mixedHash).foreach { h =>
        val (j, w) = graft.llm.Sketches.hllJW(h)
        val rho = if (w == 0) 25L
          else 24L - java.lang.Long.toBinaryString(w).length + 1
        if (rho > regs.getOrElse(j.toLong, 0L)) regs(j.toLong) = rho
      }
      assert(batch == regs.toMap)
    } finally q.stop()
  }
}
