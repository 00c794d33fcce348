package graft.ingest

import graft.SparkSpec

/** Behavioral spec of the envelope parser, fixture-for-fixture against
  * the reference's branches (FIXTURES.md §1;
  * `DebeziumTransactionReconstructor.java:97-129`).
  */
class DebeziumParserSpec extends SparkSpec {
  import spark.implicits._

  private val change =
    """{"payload": {"op": "c", "ts_ms": 1722988800000,
      |  "transaction": {"id": "file=binlog.000002,pos=1234"},
      |  "before": null,
      |  "after": {"id": 1001, "name": "alice"}}}""".stripMargin
  private val begin =
    """{"payload": {"status": "BEGIN", "id": "file=binlog.000002,pos=1234", "event_count": null}}"""
  private val end =
    """{"payload": {"status": "END", "id": "file=binlog.000002,pos=1234", "event_count": 3}}"""
  private val noPayload = """{"schema": {}}"""
  private val notJson   = "not json"
  private val noTxnBlock =
    """{"payload": {"op": "u", "ts_ms": 5, "before": {"a": 1}, "after": {"a": 2}}}"""

  private def splitAll(rows: String*) =
    DebeziumParser.parseAndSplit(spark.createDataset(rows))

  test("change event: op/txn-id/ts extracted, images stay raw JSON") {
    val (c, t, dead) = splitAll(change)
    val e = c.collect().head
    assert(e.transactionId == "file=binlog.000002,pos=1234")
    assert(e.operation == "c")
    assert(e.tsMs == 1722988800000L)
    assert(e.before.isEmpty) // JSON null → no before image (insert)
    assert(e.after.exists(_.contains("\"alice\"")))
    assert(t.isEmpty && dead.isEmpty)
  }

  test("txn events: discriminated by presence of status") {
    val (c, t, dead) = splitAll(begin, end)
    assert(c.isEmpty && dead.isEmpty)
    val byStatus = t.collect().map(e => e.status -> e).toMap
    assert(byStatus("BEGIN").eventCount.isEmpty)
    assert(byStatus("END").eventCount.contains(3L))
    assert(byStatus.values.forall(_.transactionId == "file=binlog.000002,pos=1234"))
  }

  test("malformed rows route to dead letter, not to either stream") {
    val (c, t, dead) = splitAll(noPayload, notJson, change)
    assert(c.count() == 1 && t.isEmpty)
    assert(dead.as[String].collect().toSet == Set(noPayload, notJson))
  }

  test("missing transaction block → empty-string txn id (Jackson path default)") {
    val (c, _, _) = splitAll(noTxnBlock)
    assert(c.collect().head.transactionId == "")
  }

  test("explicit status:null routes to txn stream (key presence, not value)") {
    // The reference discriminates on payload.has("status") — an envelope
    // with "status": null is still a transaction event.
    val nullStatus = """{"payload": {"status": null, "id": "t9", "event_count": 2}}"""
    val (c, t, dead) = splitAll(nullStatus, change)
    assert(c.count() == 1 && dead.isEmpty)
    val e = t.collect().head
    assert(e.transactionId == "t9" && e.status == "" && e.eventCount.contains(2L))
  }

  test("forward compatibility: unknown envelope fields are ignored") {
    // Debezium connectors grow fields across versions (source block
    // additions, new metadata). A consumer pinned to the current
    // schema must keep parsing — from_json drops unmatched keys —
    // rather than dead-lettering every post-upgrade event.
    val evolved =
      """{"payload": {"op": "c", "ts_ms": 7,
        |  "transaction": {"id": "t1", "total_order": 4,
        |                  "data_collection_order": 2},
        |  "source": {"version": "9.9.9", "connector": "mysql",
        |             "sequence": "[null,\"123\"]"},
        |  "brand_new_top_level": {"x": 1},
        |  "before": null, "after": {"id": 5}}}""".stripMargin
    val evolvedTxn =
      """{"payload": {"status": "END", "id": "t1", "event_count": 1,
        |  "data_collections": [{"data_collection": "db.t", "event_count": 1}]}}"""
        .stripMargin
    val (c, t, dead) = splitAll(evolved, evolvedTxn)
    assert(dead.isEmpty, "evolved envelopes must not dead-letter")
    val e = c.collect().head
    assert(e.transactionId == "t1" && e.operation == "c" && e.tsMs == 7L)
    assert(e.after.exists(_.contains("\"id\"")))
    val te = t.collect().head
    assert(te.status == "END" && te.eventCount.contains(1L))
  }
}
