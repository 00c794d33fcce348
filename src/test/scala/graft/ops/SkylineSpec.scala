package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q_skyline vs the textbook O(n²) dominance recompute — the
  * two-level bucketed plan must produce EXACTLY the naive frontier.
  */
class SkylineSpec extends SparkSpec {

  test("q_skyline equals the brute-force Pareto frontier") {
    val pts = Tables.part(spark, sf())
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100, r.getInt(1)))
      .map { case (p, s) => (p.toLongExact, s) }
    // strict dominance: q beats p on one axis, no worse on the other
    def dominated(p: (Long, Int)) = pts.exists { q =>
      q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2)
    }
    val frontier = pts.filterNot(dominated).distinct
    val expected = frontier.map { case (price, size) =>
      (price, size, pts.count(_ == ((price, size))).toLong)
    }.toSet
    val got = SparkEntry.queries("q_skyline")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected)
  }
}
