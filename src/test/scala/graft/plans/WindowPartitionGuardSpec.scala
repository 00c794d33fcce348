package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** The sweeping scale guard the round-5 review asked for: NO registered
  * query may plan a `WindowExec`/`WindowGroupLimitExec` with an EMPTY
  * partition spec over an unbounded frame. Spark executes such a window
  * by moving the entire frame to a single partition ("WindowExec: No
  * Partition Defined") — the quietest way a correct query dies at
  * 100 TB, and the exact anti-pattern three queries carried into round
  * 5 (q_bm25, q_bigram_novelty, q_decile_lift — all since rewritten).
  *
  * A partition-less window IS legitimate when its input is k-bounded:
  * the `orderBy().limit(k)` + rank pattern plans the limit as
  * TakeOrderedAndProject and then ranks k rows. Boundedness is detected
  * structurally (a limit node somewhere below the window); frames that
  * are bounded by construction but not visibly so (a ≤-fixed-group-count
  * aggregate feeding a cumulative window) must be allowlisted HERE with
  * a justification, which keeps every future exception an explicit,
  * reviewed decision instead of a silent regression.
  */
class WindowPartitionGuardSpec extends SparkSpec {

  /** Queries allowed a partition-less window over a frame that carries
    * no limit node but is bounded by construction. Value = why.
    */
  private val boundedByConstruction: Map[String, String] = Map(
    "q_gini" -> ("cumulative Lorenz sum runs over the spend-bucket " +
      "aggregate — ≤ GINI_BUCKETS (20) rows by construction; the whole " +
      "point of the binned estimator is avoiding the per-customer sort"),
    "q_skyline" -> ("cross-bucket prefix-max runs over the price-BUCKET " +
      "aggregate (span/width rows, data-independent); the per-point " +
      "windows are bucket-partitioned and the point frame is bounded " +
      "by the price DOMAIN, not row count — see qSkyline's scaladoc"),
    "q_gap_histogram" -> ("cumulative share runs over the log2-bucket " +
      "aggregate — ≤64 rows by the 63-bit gap domain, data-independent; " +
      "the per-gap window is user-partitioned")
  )

  private def hasLimitBelow(p: SparkPlan): Boolean =
    p.collectFirst {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      case g: org.apache.spark.sql.execution.GlobalLimitExec => g
      case l: org.apache.spark.sql.execution.LocalLimitExec => l
      case c: org.apache.spark.sql.execution.CollectLimitExec => c
    }.isDefined

  test("no query plans a partition-less window over an unbounded frame") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, sf()).queryExecution.executedPlan
          val bad = plan.collect {
            case w: WindowExec
                if w.partitionSpec.isEmpty && !hasLimitBelow(w.child) => w
            case w: WindowGroupLimitExec
                if w.partitionSpec.isEmpty && !hasLimitBelow(w.child) => w
          }
          if (bad.nonEmpty && !boundedByConstruction.contains(name))
            Some(s"$name (${bad.size} partition-less window(s))")
          else None
      }
      assert(offenders.isEmpty,
        s"single-partition window plans detected — rank via " +
          s"orderBy().limit(k) + row_number over the k rows, or " +
          s"partition the window: ${offenders.mkString(", ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }
}
