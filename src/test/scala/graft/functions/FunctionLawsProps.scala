package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based laws for the custom expression/aggregate kernels —
  * the pure-function halves, so thousands of generated cases run
  * without a SparkSession.
  */
object FunctionLawsProps extends Properties("FunctionLaws") {

  // Unicode strings incl. supplementary-plane codepoints (the case
  // where UTF-16 code units and codepoints diverge).
  private val unicodeGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.choose(0x20, 0x7e),
    2 -> Gen.choose(0xa0, 0x2fff),
    1 -> Gen.choose(0x10000, 0x10fff)
  )).map(cps => cps.map(Character.toChars(_).mkString).mkString)

  /** Reference fold in the documented semantics: over CODEPOINTS. */
  private def refHash(s: String): Long = {
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  property("PolyHash.hash folds codepoints, not UTF-16 units") =
    forAll(unicodeGen) { s => PolyHash.hash(s) == refHash(s) }

  property("PolyHash.hash stays within [0, P)") =
    forAll(unicodeGen) { s =>
      val h = PolyHash.hash(s); h >= 0 && h < PolyHash.P
    }

  // The sketch post-mix (graft.llm.Sketches): h → (h·A + B) mod P must
  // be a BIJECTION on [0, P) — P is prime and A ≢ 0 (mod P), so A is
  // invertible and distinctness is exactly preserved (the property
  // q_kmv_distinct's exact-vs-estimate calibration relies on: mixing
  // may never merge two distinct hashes). Also pins the range.
  private val hashGen: Gen[Long] = Gen.choose(0L, PolyHash.P - 1)

  property("Sketches mix is injective on [0, P)") =
    forAll(hashGen, hashGen) { (h1, h2) =>
      def mix(h: Long): Long =
        (h * graft.llm.Sketches.MIX_A + graft.llm.Sketches.MIX_B) %
          PolyHash.P
      (h1 == h2) == (mix(h1) == mix(h2))
    }

  property("Sketches mix stays within [0, P)") =
    forAll(hashGen) { h =>
      val m = (h * graft.llm.Sketches.MIX_A + graft.llm.Sketches.MIX_B) %
        PolyHash.P
      m >= 0 && m < PolyHash.P
    }

  // Strings biased toward canonical-equivalence material: ASCII plus
  // combining marks (U+0300–U+036F) and precomposed Latin-1 letters —
  // the inputs where NFC actually rewrites bytes.
  private val combiningGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.choose(0x20, 0x7e),
    3 -> Gen.choose(0x300, 0x36f),
    2 -> Gen.choose(0xc0, 0xff),
    1 -> Gen.choose(0x1100, 0x1112) // Hangul leading jamo
  )).map(cps => cps.map(Character.toChars(_).mkString).mkString)

  property("NfcNormalize.nfc is idempotent") =
    forAll(combiningGen) { s =>
      val once = NfcNormalize.nfc(s)
      NfcNormalize.nfc(once) == once
    }

  property("NfcNormalize.nfc matches java.text.Normalizer") =
    forAll(combiningGen) { s =>
      NfcNormalize.nfc(s) ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  property("NfcNormalize.nfc preserves canonical equivalence class") =
    forAll(combiningGen) { s =>
      // NFD(nfc(s)) == NFD(s): normalization may rewrite bytes but
      // never change which canonical class the text belongs to
      java.text.Normalizer.normalize(NfcNormalize.nfc(s),
        java.text.Normalizer.Form.NFD) ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    }

  private val doubles = Gen.listOf(Gen.chooseNum(-1e9, 1e9))
  private val kGen = Gen.choose(1, 8)

  /** The spec TopKAggregate must satisfy regardless of partitioning. */
  private def topK(xs: Seq[Double], k: Int): Seq[Double] =
    xs.sortBy(-_).take(k)

  property("TopKAggregate: any partitioning reduces+merges to sorted top-k") =
    forAll(doubles, kGen, Gen.choose(0, 100)) { (xs, k, cut) =>
      val agg = new TopKAggregate(k)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.length + 1))
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.finish(agg.merge(bl, br)).toSeq
      Prop(merged == topK(xs, k)) :| s"got $merged want ${topK(xs, k)}"
    }

  property("TopKAggregate: merge is commutative") =
    forAll(doubles, doubles, kGen) { (a, b, k) =>
      val agg = new TopKAggregate(k)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba.clone(), bb.clone()).toSeq ==
        agg.merge(bb.clone(), ba.clone()).toSeq
    }

  property("TopKAggregate: merge is associative") =
    forAll(doubles, doubles, doubles, kGen) { (a, b, c, k) =>
      val agg = new TopKAggregate(k)
      def buf(xs: Seq[Double]) = xs.foldLeft(agg.zero)(agg.reduce)
      val (ba, bb, bc) = (buf(a), buf(b), buf(c))
      agg.merge(agg.merge(ba.clone(), bb.clone()), bc.clone()).toSeq ==
        agg.merge(ba.clone(), agg.merge(bb.clone(), bc.clone())).toSeq
    }

  // The closed-form tile assignment q_rfm / q_decile_lift embed in
  // SQL: with q = n div T, r = n mod T, rank 1..n maps to
  //   IF(rnk <= r·(q+1), (rnk + q) div (q + 1),
  //      r + (rnk − r·(q+1) + q − 1) div q)
  // which must equal SQL ntile(T) over a unique ordering (tiles 1..r
  // hold q+1 rows, the rest q). The oracle comparison proves it on
  // data-sized n; this proves the ARITHMETIC for arbitrary n.
  private def tileOf(rnk: Long, n: Long, t: Long): Long = {
    val q = n / t
    val r = n % t
    if (rnk <= r * (q + 1)) (rnk + q) / (q + 1)
    else r + (rnk - r * (q + 1) + q - 1) / q
  }

  private def refNtile(n: Long, t: Long): Seq[Long] = {
    val q = n / t
    val r = n % t
    (1L to t).flatMap(i =>
      Seq.fill(((if (i <= r) q + 1 else q)).toInt)(i))
  }

  private val ntileGen = for {
    t <- Gen.choose(1L, 20L)
    n <- Gen.choose(t, 5000L) // at least one row per tile
  } yield (n, t)

  property("closed-form tile assignment equals ntile semantics") =
    forAll(ntileGen) { case (n, t) =>
      val expected = refNtile(n, t)
      (1L to n).forall(rnk => tileOf(rnk, n, t) == expected(rnk.toInt - 1))
    }

  property("tile assignment partitions ranks into near-equal tiles") =
    forAll(ntileGen) { case (n, t) =>
      val sizes = (1L to n).groupBy(rnk => tileOf(rnk, n, t)).values
        .map(_.size.toLong)
      sizes.sum == n && sizes.max - sizes.min <= 1 &&
        sizes.size == math.min(n, t)
    }
}
