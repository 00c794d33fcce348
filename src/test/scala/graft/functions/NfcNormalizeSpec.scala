package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[NfcNormalize]] — both evaluation paths (interpreted eval on a
  * local row, whole-stage codegen over a DataFrame) against
  * `java.text.Normalizer` ground truth, on the canonical-equivalence
  * cases that break byte-level dedup: Latin combining marks, Hangul
  * jamo composition, supplementary-plane passthrough.
  */
class NfcNormalizeSpec extends SparkSpec {

  private val cases = Seq(
    // decomposed Latin: e + COMBINING ACUTE → é
    "café" -> "café",
    // Hangul jamo sequence → precomposed syllable 한
    "한" -> "한",
    // already-NFC text is untouched (fast path)
    "plain ascii" -> "plain ascii",
    "café" -> "café",
    // supplementary plane (no canonical decomposition) passes through
    "😀 ok" -> "😀 ok",
    "" -> ""
  )

  test("codegen path matches Normalizer ground truth") {
    NfcNormalize.register(spark)
    import spark.implicits._
    val out = cases.map(_._1).toDF("s")
      .select(NfcNormalize.nfc_normalize(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }

  test("interpreted eval and Scala twin agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    cases.foreach { case (in, want) =>
      val got = NfcNormalize(Literal(UTF8String.fromString(in)))
        .eval(null).asInstanceOf[UTF8String].toString
      assert(got == want, s"eval mismatch for ${in.map(_.toInt)}")
      assert(NfcNormalize.nfc(in) == want)
    }
  }

  test("null propagates") {
    NfcNormalize.register(spark)
    import spark.implicits._
    val out = Seq[Option[String]](None).toDF("s")
      .select(NfcNormalize.nfc_normalize(col("s")).as("n"))
      .collect().head
    assert(out.isNullAt(0))
  }
}
