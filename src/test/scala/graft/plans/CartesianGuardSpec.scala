package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** The second sweeping plan gate (sibling of
  * [[WindowPartitionGuardSpec]]): NO registered query may plan a
  * `CartesianProductExec`. A cross join is legitimate in this codebase
  * ONLY when one side is a broadcast-bounded scalar/metadata frame —
  * those plan as BroadcastNestedLoopJoin over a ≤-constant-row build
  * side and are fine; a CartesianProductExec means BOTH sides shuffle
  * into an n×m partition grid, the quietest quadratic blowup a correct
  * query can carry to 100 TB. The round-5 review audited all 35
  * crossJoin call sites by hand; this spec makes that audit a
  * permanent regression gate.
  */
class CartesianGuardSpec extends SparkSpec {

  /** Queries allowed a true Cartesian product, with the justification.
    * Value = why.
    */
  private val deliberate: Map[String, String] = Map(
    "q_cross" -> ("the 5×5×5 dimension-grid cartesian is the query's " +
      "documented point (RelationalQueries.scala) — all sides are " +
      "constant-bounded dimension frames")
  )

  test("no query plans a CartesianProductExec") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, sf()).queryExecution.executedPlan
          val bad = plan.collect { case c: CartesianProductExec => c }
          if (bad.nonEmpty && !deliberate.contains(name))
            Some(s"$name (${bad.size})")
          else None
      }
      assert(offenders.isEmpty,
        "Cartesian product plans detected — broadcast the bounded " +
          s"side or add an equi-key: ${offenders.mkString(", ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }
}
