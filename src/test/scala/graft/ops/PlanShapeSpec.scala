package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec

/** Plan-shape proof for the two-level grouping-sets family: the
  * Expand node (which replicates its input once per grouping set —
  * ×3 rollup/sets, ×4 cube) must sit ABOVE a pre-aggregation, so it
  * replicates group-count rows, never the scanned input. This is the
  * property SCALE.md claims; the spec pins it against regression.
  */
class PlanShapeSpec extends SparkSpec {

  test("grouping-sets family expands group partials, not input rows") {
    // AQE wraps the plan adaptively; the static plan is what carries
    // the Expand/aggregate nesting being asserted.
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q_grouping_sets", "q_rollup", "q_cube")) {
        val df = graft.SparkEntry.queries(q)(spark, sf())
        val expands = df.queryExecution.executedPlan.collect {
          case e: ExpandExec => e
        }
        assert(expands.nonEmpty, s"$q: no Expand in plan")
        expands.foreach { e =>
          val aggBelow = e.child.collectFirst {
            case a: BaseAggregateExec => a
          }
          assert(aggBelow.isDefined,
            s"$q: Expand feeds off the raw input (no pre-aggregation)")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }
}
