package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup detection: cross-batch candidate discovery and
  * exact parity with the batch MinHash pipeline.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("map-only signatures equal the batch aggregated signatures") {
    graft.functions.ShinglePolyHash.register(spark)
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val mapSide = docs
      .select((col("doc_id") +: StreamingDedup.signatureCols(col("text"))): _*)
      .filter(col("sig0").isNotNull)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val aggSide = graft.llm.Dedup.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(mapSide == aggSide)
  }

  test("near-dup pair discovered across batches; unrelated docs silent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val base = (1 to 14).map(i => s"tok$i").mkString(" ")
    val out = StreamingDedup.candidatePairs(
      input.toDS().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("sd_pairs")
      .outputMode("append").start()
    try {
      input.addData((1L, base), (7L, (1 to 14).map(i => s"zzz$i").mkString(" ")))
      q.processAllAvailable()
      assert(spark.table("sd_pairs").count() == 0) // nothing similar yet
      input.addData((2L, base.replace("tok7", "tok7x")))
      q.processAllAvailable()
      val pairs = spark.table("sd_pairs")
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)))
    } finally q.stop()
  }

  test("streamed corpus yields exactly the batch candidate set") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val expected = graft.llm.Dedup
      .bandCandidates(graft.llm.Dedup.minhashSignatures(docs), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val rows = docs.as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.candidatePairs(
      input.toDS().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("sd_corpus")
      .outputMode("append").start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
      val streamed = spark.table("sd_corpus")
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == expected && expected.nonEmpty)
    } finally q.stop()
  }
}
