package graft.llm

import java.nio.file.Files

import graft.SparkSpec

/** Semantic checks for the sketch operators (the oracle gate checks
  * cross-engine equality; these check that the ESTIMATES mean what
  * they claim on corpora with known ground truth).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.PolyHash.register(spark)

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("sketch-spec").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("kmv distinct: below K the estimate IS the exact count") {
    val dir = writeDocs((1L to 40L).map(i => (i, s"unique text $i", "s0")))
    val r = Sketches.queries("q_kmv_distinct")(spark, dir).collect().head
    assert(r.getAs[Long]("k_used") == 40L)
    assert(r.getAs[Long]("est_distinct") == 40L)
    assert(r.getAs[Long]("exact_distinct") == 40L)
    assert(r.getAs[Long]("err_ppm") == 0L)
  }

  test("kmv distinct: above K the estimate lands near the truth") {
    // 2000 distinct texts with K=256 — the standard error of KMV is
    // ~n/sqrt(K) ≈ 6%; assert a loose 25% band (deterministic data,
    // so this is a fixed value, not a flaky bound).
    val n = 2000
    val dir = writeDocs((1L to n.toLong).map(i => (i, s"doc body $i", "s0")))
    val r = Sketches.queries("q_kmv_distinct")(spark, dir).collect().head
    val est = r.getAs[Long]("est_distinct")
    assert(r.getAs[Long]("exact_distinct") == n.toLong)
    assert(est > n * 0.75 && est < n * 1.25,
      s"KMV estimate $est too far from $n")
  }

  test("kmv overlap: estimates track a known 1/3 Jaccard") {
    // A = 1..600, B = 301..900 → |A∩B| = 300, |A∪B| = 900, J = 1/3.
    // Union ≫ K so the order statistics are in the sketch's working
    // regime (with union ≈ K the estimator is all noise). Deterministic
    // data → fixed values; the bands document the expected accuracy.
    val a = (1L to 600L).map(i => (i, s"shared corpus item $i", "sA"))
    val b = (301L to 900L).map(i => (i + 10000L, s"shared corpus item $i", "sB"))
    val dir = writeDocs(a ++ b)
    val r = Sketches.queries("q_kmv_overlap")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("src_a") == "sA")
    assert(row.getAs[Long]("exact_inter") == 300L)
    val j = row.getAs[Long]("jaccard_ppm")
    assert(j > 233000L && j < 433000L, s"jaccard_ppm $j not near 333333")
    val inter = row.getAs[Long]("inter_est")
    assert(inter > 200L && inter < 420L, s"inter_est $inter not near 300")
    val un = row.getAs[Long]("union_est")
    assert(un > 700L && un < 1100L, s"union_est $un not near 900")
  }

  test("countmin: never underestimates, and exact when B is ample") {
    // 30 distinct tokens into 3×512 buckets — collisions possible but
    // the min-over-rows estimate must be ≥ exact for every token.
    val dir = writeDocs(Seq(
      (1L, ("heavy " * 50).trim, "s0"),
      (2L, (1 to 29).map(i => s"tok$i").mkString(" "), "s0")))
    val rows = Sketches.queries("q_countmin")(spark, dir).collect()
    val byTok = rows.map(r => r.getAs[String]("tok") ->
      (r.getAs[Long]("exact_n"), r.getAs[Long]("cms_est"))).toMap
    assert(byTok("heavy")._1 == 50L)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"),
        s"CMS underestimated ${r.getAs[String]("tok")}")
      assert(r.getAs[Long]("over_ppm") >= 0L)
    }
  }

  test("hll: registers and estimate equal the Scala-side all-integer HLL") {
    val n = 2000
    val texts = (1L to n.toLong).map(i => s"hll body $i")
    val dir = writeDocs(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "s0")
    })
    // Scala recompute of the 64-register, 24-rank-bit sketch.
    val regs = Array.fill(64)(0L)
    texts.map(Sketches.mixedHash).distinct.foreach { h =>
      val (j, w) = Sketches.hllJW(h)
      val rho = if (w == 0) 25L
        else 24L - java.lang.Long.toBinaryString(w).length + 1
      if (rho > regs(j)) regs(j) = rho
    }
    val z = regs.map(m => 1L << (30 - m)).sum
    val est = (709L * 64 * 64 * (1L << 30)) / (z * 1000)
    val r = Sketches.queries("q_hll")(spark, dir).collect().head
    assert(r.getAs[Long]("n_empty") == regs.count(_ == 0L).toLong)
    assert(r.getAs[Long]("z_scaled") == z)
    assert(r.getAs[Long]("est_distinct") == est)
    assert(r.getAs[Long]("exact_distinct") == n.toLong)
    // raw-range HLL on 2000 >> 2.5m: the estimate must land in the
    // ±3σ band of the published 1.04/sqrt(64) = 13% standard error
    // (deterministic data — a fixed value, not a flaky bound).
    assert(est > n * 0.6 && est < n * 1.4, s"HLL estimate $est vs $n")
  }

  test("hll: per-shard register vectors merge to the corpus sketch") {
    // The mergeability law the 100 TB deployment rests on: sketch each
    // shard independently, take the per-register MAX across shards,
    // and the merged vector must equal the whole-corpus sketch exactly
    // (register max is associative/commutative — order and shard
    // boundaries cannot matter).
    val texts = (1L to 1500L).map(i => s"merge law $i")
    def sketch(ts: Seq[String]): Array[Long] = {
      val regs = Array.fill(64)(0L)
      ts.map(Sketches.mixedHash).distinct.foreach { h =>
        val (j, w) = Sketches.hllJW(h)
        val rho = if (w == 0) 25L
          else 24L - java.lang.Long.toBinaryString(w).length + 1
        if (rho > regs(j)) regs(j) = rho
      }
      regs
    }
    val whole = sketch(texts)
    val shards = texts.grouped(97).map(sketch).toSeq
    val merged = shards.reduce((a, b) =>
      a.zip(b).map { case (x, y) => math.max(x, y) })
    assert(merged.toSeq == whole.toSeq)
  }

  test("selfjoin est: F2 past int64 stays exact in DECIMAL(38,0)") {
    // Σc² > 2⁶³ is unreachable by materializing rows, so feed the
    // estimator synthetic per-user counts directly. 50 heavy users at
    // c = 4e9 plus a perfectly uniform 10-user tail at c = 1e9:
    //   f2_exact = 50·(4e9)² + 10·(1e9)² = 8.1e20  (≈ 88× int64 max)
    // and the uniform tail makes the heavy-hitter estimate EXACT, so
    // both f2 columns must carry the same 21-digit decimal and
    // err_ppm = 0. A BIGINT route would have gone NULL here.
    val heavy = 4000000000L; val tail = 1000000000L
    val counts = ((1L to 50L).map(u => (u, heavy)) ++
      (51L to 60L).map(u => (u, tail))).toDF("user_id", "c")
    val r = Sketches.selfjoinEstFromCounts(counts).collect().head
    val expected = BigInt(50) * BigInt(heavy) * BigInt(heavy) +
      BigInt(10) * BigInt(tail) * BigInt(tail)
    assert(expected > BigInt(Long.MaxValue)) // the regime under test
    // The query emits canonical strings (precision-38 decimals don't
    // hash stably across parquet readers); parse them back to verify
    // the internal DECIMAL route carried the full 21 digits.
    val f2Exact = r.getAs[String]("f2_exact")
    val f2Est = r.getAs[String]("f2_est")
    assert(f2Exact != null && f2Est != null, "decimal route went NULL")
    assert(BigInt(f2Exact) == expected)
    assert(BigInt(f2Est) == expected)
    assert(r.getAs[Long]("err_ppm") == 0L)
    assert(r.getAs[Long]("n_users") == 60L)
    assert(r.getAs[Long]("n_rows") == 50L * heavy + 10L * tail)
  }
}
