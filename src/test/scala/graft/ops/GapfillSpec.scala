package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Forward-fill semantics of q_gapfill on a controlled sparse series. */
class GapfillSpec extends SparkSpec {
  import spark.implicits._

  test("gap rows get n=0 and carry the last observed total forward") {
    val d = Files.createTempDirectory("gapfill-spec").toString
    // user 1: events in hour 0 and hour 3 only (of the 49-slot grid)
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "a", 10.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:50:00"), 1L, "a", 5.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 03:20:00"), 1L, "a", 7.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val rows = RelationalQueries.queries("q_gapfill")(spark, d)
      .orderBy("h").collect()
    assert(rows.length == 49) // one user x 49 hourly slots
    val byHour = rows.map(r => r.getTimestamp(1).toString.take(13) ->
      (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(byHour("2024-01-01 00") == (2L, Some(15.0))) // two events summed
    assert(byHour("2024-01-01 01") == (0L, Some(15.0))) // gap: carried forward
    assert(byHour("2024-01-01 02") == (0L, Some(15.0)))
    assert(byHour("2024-01-01 03") == (1L, Some(7.0)))  // new observation wins
    assert(byHour("2024-01-02 23") == (0L, Some(7.0)))  // carried to grid end
  }
}
