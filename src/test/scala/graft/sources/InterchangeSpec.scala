package graft.sources

import graft.{SparkSpec, Tables}
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.functions.col

/** JSONL interchange: schema-enforced reads, corrupt-line routing.
  * The write/read path must round-trip a corpus exactly, and a
  * malformed line must land whole in the dead-letter frame — never
  * kill the read, never vanish.
  */
class InterchangeSpec extends SparkSpec {

  test("jsonl round-trips the documents table under an explicit schema") {
    val tmp = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf())
    Interchange.writeJsonl(docs, s"$tmp/docs")
    val (good, bad) = Interchange.readJsonlSplit(
      spark, s"$tmp/docs", docs.schema)
    assert(bad.count() == 0)
    assert(good.collect().map(_.toSeq).toSet ==
      docs.collect().map(_.toSeq).toSet)
  }

  test("malformed lines route to the dead-letter frame, not the job") {
    val tmp = Files.createTempDirectory("graft-jsonl-bad").toString
    val docs = Tables.documents(spark, sf()).limit(10)
    Interchange.writeJsonl(docs, s"$tmp/docs")
    // corrupt the input: a late-arriving file with one truncated
    // object and one non-JSON line (a fresh file, not an append —
    // appending would invalidate the local-FS CRC sidecar, which is a
    // filesystem failure, not the parse failure under test)
    Files.write(Paths.get(s"$tmp/docs/late-arrival.json"),
      "{\"doc_id\": 999999, \"text\": \ni am not json\n".getBytes,
      StandardOpenOption.CREATE)
    val (good, bad) = Interchange.readJsonlSplit(
      spark, s"$tmp/docs", docs.schema)
    assert(good.count() == 10)
    assert(bad.count() == 2)
    // the dead letter carries the raw line for replay/debugging
    assert(bad.filter(col("raw").contains("not json")).count() == 1)
  }
}
