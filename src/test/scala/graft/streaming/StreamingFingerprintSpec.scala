package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming substring-fingerprint matching: cross-batch discovery and
  * parity with the batch winnowed-fingerprint audit.
  */
class StreamingFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val span = ("the quick brown fox jumps over the lazy dog " * 3).trim

  test("shared span matched across batches; unique docs silent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingFingerprint.matches(
      input.toDS().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("fp_matches")
      .outputMode("append").start()
    try {
      input.addData((1L, span + " unique tail one here"),
        (3L, "completely unrelated content with nothing shared at all" +
          " here and then more padding words for plenty of windows"))
      q.processAllAvailable()
      assert(spark.table("fp_matches").count() == 0)
      // Misaligned copy (offset 14): content-keyed selection must match.
      input.addData((2L, "thirteen head " + span))
      q.processAllAvailable()
      val pairs = spark.table("fp_matches")
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)))
    } finally q.stop()
  }

  test("streamed corpus flags exactly the batch's duplicated docs") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val flagged = graft.llm.Tokenization.substringDup(docs)
      .filter(col("n_dup") > 0)
      .collect().map(_.getLong(0)).toSet

    val rows = docs.as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val out = StreamingFingerprint.matches(
      input.toDS().toDF("doc_id", "text"), maxPerHash = Int.MaxValue)
    val q = out.writeStream.format("memory").queryName("fp_corpus")
      .outputMode("append").start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
      val streamed = spark.table("fp_corpus")
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct().collect().map(_.getLong(0)).toSet
      assert(streamed == flagged)
    } finally q.stop()
  }
}
