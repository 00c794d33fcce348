package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the tokenizer-training / char-level operators
  * (the oracle gate checks cross-engine equality; these check meaning
  * on corpora small enough to verify by hand).
  */
class TokenizationSpec extends SparkSpec {
  import spark.implicits._

  test("bpe iter: merges follow count order and expand to source chars") {
    // Vocabulary is one word type "aaab" with freq 2.
    //  round 1: pairs aa(2 positions x2 = 4), ab(2) -> merge "aa" n=4
    //  round 2: <aa>ab -> pairs (<aa>a)=2, (ab)=2; tie broken by pair
    //           string order: "ab" < "a" -> merge "ab" n=2
    //  round 3: <aa><ab> -> one pair n=2, expands to "aaab"
    val docs = Seq((1L, "aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val out = Tokenization.bpeIter(docs)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "aa", 4L), (2, "ab", 2L), (3, "aaab", 2L)))
  }

  test("bpe iter: merge application is left-to-right non-overlapping") {
    // "aaaa" x3: round 1 merges "aa" (3 adjacent positions x3 = 9);
    // "aaaa".replace("aa") -> <aa><aa>, NOT <aa>a a — so round 2's
    // winner is (<aa><aa>) with n=3, expanding to "aaaa".
    val docs = Seq((1L, "aaaa"), (2L, "aaaa"), (3L, "aaaa"))
      .toDF("doc_id", "text")
    val out = Tokenization.bpeIter(docs)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((1, "aa", 9L)))
    assert(out(1) == ((2, "aaaa", 3L)))
  }

  test("fertility: ratios are exact integer ppm per language") {
    // "ab1 cd": 2 whitespace words; regex subwords "ab","1","cd" = 3.
    val docs = Seq((1L, "ab1 cd", "en", "s1", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Tokenization.fertility(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("ws_tokens") == 2L)
    assert(row.getAs[Long]("subword_tokens") == 3L)
    assert(row.getAs[Long]("fertility_ppm") == 1500000L)
    assert(row.getAs[Long]("chars_per_subword_ppm") == 2000000L)
  }

  test("fertility: ratios stay exact past the int64 product bound") {
    // Three docs carrying 4·10¹² chars each: total_chars = 1.2·10¹³,
    // so the naive BIGINT product total_chars·10⁶ ≈ 1.2·10¹⁹ wraps
    // past 2⁶³ ≈ 9.2·10¹⁸ — the regime the DECIMAL(38,0) routing
    // exists for. Each text is "ab1 cd": 2 ws words, 3 regex subwords.
    val big = 4L * 1000 * 1000 * 1000 * 1000
    val docs = Seq(
      (1L, "ab1 cd", "en", "s1", big),
      (2L, "ab1 cd", "en", "s1", big),
      (3L, "ab1 cd", "en", "s1", big)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = Tokenization.fertility(docs).collect().head
    val total = BigInt(big) * 3
    assert((total * 1000000).toString.length > 19) // past int64
    assert(row.getAs[Long]("total_chars") == total.toLong)
    assert(row.getAs[Long]("chars_per_subword_ppm") ==
      (total * 1000000 / 9).toLong)
    assert(row.getAs[Long]("fertility_ppm") == 1500000L)
  }

  test("code detect: symbol-dense doc flagged, prose passes") {
    val code = "x = f(a); { y[0] = b; }"   // 10 structural symbols
    val prose = "plain words and one digit 7 only"
    val docs = Seq(
      (1L, code, "en", "s", code.length.toLong),
      (2L, prose, "en", "s", prose.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Tokenization.codeDetect(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("symbol_n") == 10L)
    assert(m(1L).getAs[Boolean]("is_code"))
    assert(m(2L).getAs[Long]("symbol_n") == 0L)
    assert(m(2L).getAs[Long]("digit_n") == 1L)
    assert(!m(2L).getAs[Boolean]("is_code"))
  }

  test("substring dup: MISALIGNED verbatim span is caught (winnowing)") {
    // Doc 2 embeds doc 1's span at a different offset (14, not a
    // multiple of any plausible stride), so a positionally-strided
    // sample would miss it; content-keyed selection must not. Span is
    // ~4x the window so it reliably contains selected fingerprints.
    val span = ("the quick brown fox jumps over the lazy dog " * 3).trim
    val docs = Seq(
      (1L, span + " unique tail one here"),
      (2L, "thirteen head " + span),
      (3L, "completely unrelated content with nothing shared at all here" +
        " and then some more padding words to give it plenty of windows")
    ).toDF("doc_id", "text")
    val m = Tokenization.substringDup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup")).toMap
    assert(m(1L) > 0 && m(2L) > 0, s"shared span undetected: $m")
    assert(m(3L) == 0)
  }

  test("rolling_hashes == poly_hash of every substring (incl. unicode)") {
    graft.functions.RollingHashWindows.register(spark)
    graft.functions.PolyHash.register(spark)
    // Supplementary-plane char (U+1D54F) exercises codepoint counting.
    val rows = Seq((1L, "abcdefghij"), (2L, "a𝕏b cdéfgh"),
      (3L, "short"), (4L, ""), (5L, "exactly8")).toDF("id", "text")
    val both = rows.select(
      expr("rolling_hashes(text, 8)").as("roll"),
      expr("CASE WHEN char_length(text) >= 8 THEN" +
        " transform(sequence(1, char_length(text) - 7)," +
        " p -> poly_hash(substring(text, p, 8)))" +
        " ELSE CAST(array() AS array<bigint>) END").as("naive"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
