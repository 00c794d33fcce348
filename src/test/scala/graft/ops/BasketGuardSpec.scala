package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the q_basket mega-basket guard (`Operational.basketRules`):
  * Σ basket² is unbounded in the largest transaction, so baskets
  * above `BASKET_MAX_ITEMS` must be excluded from the transaction
  * universe BEFORE the within-order self-join — and the guard must be
  * a no-op when every basket is under the cap (the bench/oracle
  * regime), so the DuckDB oracle contract is unchanged.
  */
class BasketGuardSpec extends SparkSpec {

  private def op(rows: (Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey")
  }

  // Four small baskets sharing parts (pair counts up to 4) plus one
  // mega basket of 40 parts that would contribute C(40,2) = 780 pairs.
  private def smallRows: Seq[(Long, Long)] =
    (1L to 4L).flatMap(o => Seq((o, 10L), (o, 20L), (o, 30L)))
  private def megaRows: Seq[(Long, Long)] =
    (1L to 40L).map(p => (99L, 100L + p))

  test("guard excludes mega-baskets from pairs, N, and item counts") {
    val guarded =
      Operational.basketRules(op(smallRows ++ megaRows: _*), 1, 10)
        .collect()
    // No pair from the mega basket (its parts are 101..140).
    assert(guarded.forall(r =>
      r.getAs[Long]("part_a") < 100L && r.getAs[Long]("part_b") < 100L))
    // N must be the surviving-transaction count (4), not 5: support of
    // the (10,20) pair seen in all four small baskets is exactly 10^6.
    val p = guarded.find(r => r.getAs[Long]("part_a") == 10L &&
      r.getAs[Long]("part_b") == 20L).get
    assert(p.getAs[Long]("c_ab") == 4L)
    assert(p.getAs[Long]("support_ppm") == 1000000L)
  }

  test("guard is a no-op when every basket is under the cap") {
    val frame = op(smallRows: _*)
    val withGuard =
      Operational.basketRules(frame, 1, 10).collect().toSeq
    val noGuard =
      Operational.basketRules(frame, 1, Int.MaxValue).collect().toSeq
    assert(withGuard == noGuard)
    assert(withGuard.nonEmpty)
  }

  test("registered q_basket result is unchanged by the guard on bench data") {
    val d = sf()
    val base = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val registered = graft.SparkEntry.queries("q_basket")(spark, d)
      .collect().toSeq
    val unguarded =
      Operational.basketRules(base, 3, Int.MaxValue).collect().toSeq
    assert(registered == unguarded)
  }
}
