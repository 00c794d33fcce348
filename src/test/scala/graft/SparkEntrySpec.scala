package graft

/** Driver-contract invariants. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("every query builds and returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf()).count()
        if (n == 0) Some(name) else None
    }
    // q_anti (customers without orders) and similarity pair queries may
    // legitimately be empty at tiny SF; everything else must produce rows.
    assert(
      empty.forall(Set("q_anti", "q_cosine_pairs", "q_minhash_lsh",
        "q_setops")),
      s"unexpectedly empty: $empty")
  }
}
