package graft.llm

import graft.{SparkEntry, SparkSpec}

/** Properties of the hybrid-retrieval fusion and the sketch-accuracy
  * audit that the row-level oracle doesn't express.
  */
class RetrievalFusionSpec extends SparkSpec {

  test("q_rank_fusion: contiguous final ranks, additive RRF scores") {
    val rows = SparkEntry.queries("q_rank_fusion")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val ranks = rows.map(_.getAs[Int]("rnk")).sorted
    assert(ranks.toSeq == (1 to rows.length), "final ranks not contiguous")
    def rrf(r: Any): Long = r match {
      case null => 0L
      case i: Int => 1000000000L / (60 + i)
    }
    rows.foreach { r =>
      val expected = rrf(r.get(r.fieldIndex("bm_rnk"))) +
        rrf(r.get(r.fieldIndex("ann_rnk")))
      assert(r.getAs[Long]("rrf_score") == expected,
        s"RRF score not the sum of its per-list components: $r")
    }
    // a doc in both lists must outrank a doc in neither's top ranks
    val both = rows.filter(r => !r.isNullAt(r.fieldIndex("bm_rnk")) &&
      !r.isNullAt(r.fieldIndex("ann_rnk")))
    if (both.nonEmpty) {
      val bestBoth = both.map(_.getAs[Long]("rrf_score")).max
      assert(bestBoth >= rows.map(_.getAs[Long]("rrf_score")).max / 2)
    }
  }

  test("q_span_corrupt: ~15% deterministic masking, stable across runs") {
    val a = SparkEntry.queries("q_span_corrupt")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getString(4))).sortBy(_._1)
    a.foreach { case (_, nTok, nMask, _, _) =>
      assert(nMask >= 0 && nMask <= nTok)
    }
    val frac = a.map(_._3).sum.toDouble / a.map(_._2).sum
    assert(frac > 0.10 && frac < 0.20,
      f"mask fraction $frac%.3f far from the 15%% target")
    // deterministic: a second evaluation reproduces every digest
    val b = SparkEntry.queries("q_span_corrupt")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getString(4))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("q_minhash_est: estimator bounded and calibrated on candidates") {
    val rows = SparkEntry.queries("q_minhash_est")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val j = r.getAs[Double]("jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(r.getAs[Double]("abs_err") - math.abs(est - j))
        < 1e-12)
    }
    // K=8 one-sided band candidates: mean |err| stays well under the
    // uninformative 0.5 (stderr ≈ sqrt(j(1-j)/K) ≤ 0.18)
    val meanErr = rows.map(_.getAs[Double]("abs_err")).sum / rows.length
    assert(meanErr < 0.3, f"estimator uncalibrated: mean |err| $meanErr%.3f")
    // the audit covers exactly the LSH candidate set
    val nCand = SparkEntry.queries("q_minhash_lsh")(spark, sf()).count()
    assert(rows.length.toLong == nCand)
  }
}
