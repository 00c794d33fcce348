package graft

import java.nio.file.Files

/** Totality on the degenerate corpus: EVERY registered query must
  * plan and execute against 0-row tables without throwing. This is
  * the "empty partition / empty day / empty tenant" guarantee a
  * production pipeline needs — a backfill window with no events, a
  * brand-new tenant's first run, a filter that eliminates everything
  * upstream. A query that divides by an empty-aggregate count, takes
  * `head` of an empty frame, or seeds an iteration from a sample of
  * nothing fails HERE instead of at 3 a.m. on the cluster.
  *
  * Only totality is asserted (execute + collect, any row count
  * including 0 is fine): the oracle gate owns value correctness, and
  * most of these queries legitimately return nothing on an empty
  * corpus. Runs every query in `SparkEntry.queries` so a newly
  * registered operator is covered automatically.
  */
class EmptyCorpusTotalitySpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty").toString
    Tables.names.foreach { t =>
      spark.read.parquet(s"${sf()}/$t.parquet")
        .limit(0)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query is total on an empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator
              .take(1).mkString}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries not total on empty input:\n" +
        failures.mkString("\n"))
  }
}
