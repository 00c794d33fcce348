package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming per-key top-k: snapshots evolve across batches and the
  * final state matches the batch aggregate over the full stream.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("snapshots track the running top-3; final equals batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val out = StreamingTopK.topKPerKey(
      input.toDS().toDF("k", "v"), "k", "v", k = 3)
    val q = out.writeStream.format("memory").queryName("stk")
      .outputMode("update").start()
    try {
      input.addData(("a", 1.0), ("a", 5.0), ("b", 2.0))
      q.processAllAvailable()
      val snap1 = spark.table("stk").collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(snap1("a") == Seq(5.0, 1.0))
      assert(snap1("b") == Seq(2.0))

      input.addData(("a", 3.0), ("a", 7.0), ("a", 0.5)) // 0.5 falls out
      q.processAllAvailable()
      val snap2 = spark.table("stk").collect()
        .filter(_.getString(0) == "a").last.getSeq[Double](1)
      assert(snap2 == Seq(7.0, 5.0, 3.0))

      // parity with the batch aggregator over the whole stream
      val all = Seq(("a", 1.0), ("a", 5.0), ("b", 2.0),
        ("a", 3.0), ("a", 7.0), ("a", 0.5))
      val batch = all.toDF("k", "v")
        .groupBy(col("k"))
        .agg(graft.functions.TopKAggregate.top_k(col("v"), 3).as("top"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val finalSnaps = spark.table("stk").collect()
        .groupBy(_.getString(0)).map { case (k, rows) =>
          k -> rows.last.getSeq[Double](1)
        }
      assert(finalSnaps("a") == batch("a"))
      assert(finalSnaps("b") == batch("b"))
    } finally q.stop()
  }
}
