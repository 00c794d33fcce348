package graft.llm

import graft.SparkSpec

/** Pins the q_levenshtein degenerate-bucket cap (round-11): on the
  * bench corpora the cap is INVISIBLE — no (band, key) name bucket
  * approaches [[Dedup.LEV_BUCKET_CAP]], so the capped query returns
  * exactly the uncapped rows — while a deliberately tiny cap proves
  * the guard is live (removes pairs, never adds). The cap is what
  * bounds candidate pairs to linear growth when ScaleUp's suffix
  * clusters inflate buckets with the scale factor (13×/decade at
  * sf10 before this).
  */
class LevenshteinCapSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("the production cap is a no-op on bench data") {
    Seq(sf(), sf("sf0.01")).foreach { d =>
      val capped = rows(Dedup.qLevenshtein(spark, d))
      val uncapped = rows(Dedup.qLevenshteinCapped(spark, d, Int.MaxValue))
      assert(capped == uncapped,
        s"$d: cap=${Dedup.LEV_BUCKET_CAP} changed the result " +
          s"(${capped.size} vs ${uncapped.size} rows) — a bench " +
          "bucket crossed the cap; raise it or re-justify")
      assert(uncapped.nonEmpty, s"$d: empty pair set proves nothing")
    }
  }

  test("a tiny cap removes pairs and never adds") {
    val d = sf("sf0.01")
    val uncapped = rows(Dedup.qLevenshteinCapped(spark, d, Int.MaxValue))
    val tiny = rows(Dedup.qLevenshteinCapped(spark, d, 1))
    assert(tiny.subsetOf(uncapped), "capped result is not a subset")
    assert(tiny.size < uncapped.size, "cap=1 removed nothing — guard dead")
  }
}
