package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.{
  BinaryComparison, Levenshtein}

/** Plan-shape pin for [[LevenshteinThresholdRule]] on the SQL path.
  *
  * `q_sql_neardup`'s query TEXT carries the natural two-argument
  * predicate `levenshtein(a, b) <= k`; the rule injected by
  * [[graft.GraftExtensions]] must rewrite it to the banded
  * three-argument form (`levenshtein(a, b, k) >= 0`, O(k·len) per
  * pair). Before this spec the rule had no test at all — a regression
  * in `injectOptimizerRule` would have shipped silently as a
  * quadratic hot loop on the near-dup verify stage.
  */
class LevenshteinRuleSpec extends SparkSpec {

  test("q_sql_neardup's optimized plan carries the banded form") {
    val plan = graft.ops.ModernSql.sqlNeardupDf(spark, sf())
      .queryExecution.optimizedPlan
    var banded = 0
    var unbanded = 0
    plan.foreach(_.expressions.foreach(_.foreach {
      case cmp: BinaryComparison =>
        Seq(cmp.left, cmp.right).foreach {
          case Levenshtein(_, _, Some(_)) => banded += 1
          case Levenshtein(_, _, None)    => unbanded += 1
          case _                          => ()
        }
      case _ => ()
    }))
    assert(banded >= 1,
      "no three-arg Levenshtein under a comparison — the injected " +
        "rule did not fire on the SQL path")
    assert(unbanded == 0,
      "a two-arg Levenshtein survived inside a comparison — the " +
        "threshold was not pushed into the banded DP")
  }

  test("the rewrite preserves the predicate's verdicts") {
    // Equivalence on the live corpus: the same blocked pairs filtered
    // by the un-rewritten predicate (rule disabled via excludedRules)
    // must match the optimized query's output exactly.
    val optimized = graft.ops.ModernSql.sqlNeardupDf(spark, sf())
      .collect().map(_.toSeq).toSet
    val prior = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      LevenshteinThresholdRule.ruleName)
    try {
      val plain = graft.ops.ModernSql.sqlNeardupDf(spark, sf())
      val survivors = plain.queryExecution.optimizedPlan.collect {
        case p => p.expressions.map(_.collect {
          case Levenshtein(_, _, None) => 1
        }.size).sum
      }.sum
      assert(survivors >= 1,
        "exclusion did not keep the two-arg form — the equivalence " +
          "check would compare the rewrite against itself")
      assert(plain.collect().map(_.toSeq).toSet == optimized)
    } finally prior match {
      case Some(v) =>
        spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None =>
        spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }
}
