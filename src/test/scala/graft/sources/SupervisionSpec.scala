package graft.sources

import graft.SparkSpec
import graft.streaming.QueryEvents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** O5 (query-lifecycle listener) + O1 (fixed-delay restart
  * supervision) — the two operational rows of SURVEY §2.1.
  */
class SupervisionSpec extends SparkSpec {
  import spark.implicits._

  /** Listener delivery is async (listener bus) — poll to a deadline. */
  private def awaitCond(timeoutMs: Long = 20000L)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(cond, "condition not met within timeout")
  }

  test("O5: listener records start, progress and clean termination") {
    val log = QueryEvents.register(spark)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDF().writeStream.format("memory")
      .queryName("qevents_clean").outputMode("append").start()
    val id = q.id.toString
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
    } finally q.stop()
    awaitCond() {
      val ks = log.eventsFor(id).map(_.kind).toSet
      ks.contains("started") && ks.contains("progress") &&
        ks.contains("terminated")
    }
    assert(!log.eventsFor(id).map(_.kind).contains("failed"))
  }

  test("O5: a killed query surfaces as a FAILED event with its cause") {
    val log = QueryEvents.register(spark)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDS().writeStream
      .foreachBatch { (_: org.apache.spark.sql.Dataset[Long], _: Long) =>
        throw new RuntimeException("injected-boom")
      }.start()
    val id = q.id.toString
    input.addData(1L)
    intercept[StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination()
    }
    awaitCond() {
      log.eventsFor(id).exists(e =>
        e.kind == "failed" && e.detail.contains("injected-boom"))
    }
  }

  test("O1 supervise: restarts from checkpoint until success") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sup").toString
    spark.range(10).toDF("v").write.parquet(s"$tmp/in")
    val collected = new ConcurrentLinkedQueue[Long]()
    val failuresLeft = new AtomicInteger(2)
    def start() = spark.readStream.schema("v LONG").parquet(s"$tmp/in")
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        // fail BEFORE any output: the retried batch replays cleanly
        if (failuresLeft.getAndDecrement() > 0)
          throw new RuntimeException("injected failing batch")
        b.collect().foreach(r => collected.add(r.getLong(0)))
        ()
      }.start()
    val restarts = Sinks.supervise(() => start(), retries = 3, delayMs = 50)
    assert(restarts == 2)
    // checkpoint resume: every row exactly once despite two replays
    assert(collected.asScala.toSeq.sorted == (0L until 10L).toSeq)
  }

  test("O1 supervise: rethrows after retries are exhausted") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sup2").toString
    spark.range(3).toDF("v").write.parquet(s"$tmp/in")
    val attempts = new AtomicInteger(0)
    def start() = spark.readStream.schema("v LONG").parquet(s"$tmp/in")
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: DataFrame, _: Long) =>
        attempts.incrementAndGet()
        throw new RuntimeException("always fails")
      }.start()
    intercept[StreamingQueryException] {
      Sinks.supervise(() => start(), retries = 2, delayMs = 10)
    }
    assert(attempts.get() == 3) // original + 2 retries
  }
}
