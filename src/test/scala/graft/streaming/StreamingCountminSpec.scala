package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming count-min: counter parity with the batch sketch, fixed
  * state size, and never-underestimating point reads.
  */
class StreamingCountminSpec extends SparkSpec {
  import spark.implicits._

  test("streamed corpus yields exactly the batch counters") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf()).select("text")
    val expected = StreamingCountmin.counters(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val texts = docs.as[String].collect().toSeq
    val input = MemoryStream[String]
    val out = StreamingCountmin.counters(input.toDS().toDF("text"))
    val q = out.writeStream.format("memory").queryName("cms_counters")
      .outputMode("complete").start()
    try {
      texts.grouped(texts.size / 3 + 1).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val got = spark.table("cms_counters")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected)
      // fixed-size sketch: the relation never exceeds D·B cells
      assert(got.size <= graft.llm.Sketches.CMS_D * graft.llm.Sketches.CMS_B)
    } finally q.stop()
  }

  test("point estimates from the snapshot never underestimate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingCountmin.counters(input.toDS().toDF("text"))
    val q = out.writeStream.format("memory").queryName("cms_probe")
      .outputMode("complete").start()
    try {
      input.addData(("alpha " * 30).trim, "beta beta gamma", "alpha beta")
      q.processAllAvailable()
      val probes = Seq("alpha", "beta", "gamma", "absent").toDF("tok")
      val est = StreamingCountmin
        .estimateFor(probes, spark.table("cms_probe"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est("alpha") >= 31L)
      assert(est("beta") >= 3L)
      assert(est("gamma") >= 1L)
      assert(est("absent") >= 0L) // may collide upward, never negative
    } finally q.stop()
  }
}
