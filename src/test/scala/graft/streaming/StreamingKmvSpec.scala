package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KMV: exact merge parity with the batch sketch, bounded
  * state, and incremental refinement across batches.
  */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  /** Batch K-minima of a set of texts via the Scala reference hash. */
  private def batchSketch(texts: Seq[String], k: Int): (Long, Vector[Long]) = {
    val distinct = texts.map(graft.llm.Sketches.mixedHash).distinct.sorted
    val minima = distinct.take(k).toVector
    val est =
      if (minima.size < k) minima.size.toLong
      else (k - 1).toLong * 1000000007L / minima.last
    (est, minima)
  }

  test("streamed corpus merges to the batch estimate bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val texts = Tables.documents(spark, sf())
      .select("text").as[String].collect().toSeq

    val input = MemoryStream[String]
    val out = StreamingKmv.shardSketches(input.toDS().toDF("text"))
    val q = out.writeStream.format("memory").queryName("kmv_snap")
      .outputMode("update").start()
    try {
      texts.grouped(texts.size / 3 + 1).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      // latest snapshot per shard, then the exact merge
      val latest = spark.table("kmv_snap")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard"))
            .orderBy(col("n_rows").desc)))
        .filter(col("rn") === 1)
        .drop("rn")
        .as[StreamingKmv.ShardSketch]
      val got = StreamingKmv.mergedEstimate(latest).collect().head
      val (expEst, expMinima) = batchSketch(texts, StreamingKmv.K)
      assert(got.getAs[Long]("est_distinct") == expEst)
      assert(got.getAs[Long]("kth_min") == expMinima.last)
      assert(got.getAs[Long]("k_used") ==
        math.min(StreamingKmv.K, expMinima.size).toLong)
    } finally q.stop()
  }

  test("per-shard state is capped at K minima regardless of volume") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingKmv.shardSketches(input.toDS().toDF("text"), k = 8)
    val q = out.writeStream.format("memory").queryName("kmv_cap")
      .outputMode("update").start()
    try {
      input.addData((1 to 500).map(i => s"doc number $i"): _*)
      q.processAllAvailable()
      val snaps = spark.table("kmv_cap")
        .select(col("shard"), size(col("minima")).as("m"), col("n_rows"))
        .collect()
      assert(snaps.nonEmpty)
      snaps.foreach(r => assert(r.getAs[Int]("m") <= 8))
      assert(snaps.map(_.getAs[Long]("n_rows")).sum == 500L)
    } finally q.stop()
  }

  test("estimate refines as more of the corpus streams in") {
    implicit val sqlCtx = spark.sqlContext
    val texts = (1 to 600).map(i => s"unique body $i")
    val input = MemoryStream[String]
    val out = StreamingKmv.shardSketches(input.toDS().toDF("text"), k = 64)
    val q = out.writeStream.format("memory").queryName("kmv_refine")
      .outputMode("update").start()
    try {
      input.addData(texts.take(50): _*)
      q.processAllAvailable()
      def est(): Long = {
        val latest = spark.table("kmv_refine")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("shard"))
              .orderBy(col("n_rows").desc)))
          .filter(col("rn") === 1).drop("rn")
          .as[StreamingKmv.ShardSketch]
        StreamingKmv.mergedEstimate(latest, k = 64)
          .collect().head.getAs[Long]("est_distinct")
      }
      val e1 = est()
      assert(e1 == 50L) // below K: exact
      input.addData(texts.drop(50): _*)
      q.processAllAvailable()
      val e2 = est()
      // 600 distinct at K=64 → ~12% standard error; wide fixed band
      assert(e2 > 360 && e2 < 900, s"estimate $e2 too far from 600")
    } finally q.stop()
  }
}
