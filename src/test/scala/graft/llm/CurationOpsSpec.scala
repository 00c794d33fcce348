package graft.llm

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 curation operators: contamination
  * flagging, stratified sampling, tf-idf ranking.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("curation-spec").toString
    rows.map { case (id, text, lang) => (id, text, lang, "test", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("contamination: a benchmark copy is flagged, disjoint text is clean") {
    // doc 0 is the benchmark (doc_id % 50 == 0); doc 1 copies it, doc 2
    // shares nothing, doc 3 shares exactly one 3-gram window.
    val dir = writeDocs(Seq(
      (0L, "alpha beta gamma delta epsilon", "en"),
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "one two three four five", "en"),
      (3L, "alpha beta gamma unrelated tail here", "en")))
    val r = TextAnalysis.queries("q_contamination")(spark, dir)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getBoolean(4))).toMap
    assert(r(1L)._2 == r(1L)._1 && r(1L)._3)       // full overlap, flagged
    assert(r(2L)._2 == 0L && !r(2L)._3)            // no overlap
    assert(r(3L)._2 == 1L && !r(3L)._3)            // one shared gram only
  }

  test("stratified: exactly floor(n/10) per stratum, deterministic picks") {
    val dir = writeDocs(
      (1L to 25L).map(i => (i, s"text $i", "en")) ++
        (26L to 30L).map(i => (i, s"text $i", "fr")))
    val out = TextAnalysis.queries("q_stratified")(spark, dir)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.get("en").contains(2L)) // floor(25/10)
    assert(!perLang.contains("fr"))        // floor(5/10) = 0
    // Deterministic: two runs pick the same ids.
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextAnalysis.queries("q_stratified")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("delta dedup: new docs attach to existing near-dups, never old×old") {
    // new shard = doc_id % 5 == 4. Doc 4 copies existing doc 1; doc 9
    // is brand new with no match; docs 1 and 2 are near-identical OLD
    // docs — an old×old pair the delta pass must NOT report.
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "alpha beta gamma delta epsilon eta", "en"),
      (4L, "alpha beta gamma delta epsilon zeta", "en"),
      (9L, "completely different words over here now", "en")))
    val r = Dedup.queries("q_dedup_delta")(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.keySet == Set(4L, 9L))       // only the new shard is output
    assert(r(4L)._1 == 1L && r(4L)._2 >= 1L) // attached to the old canonical
    assert(r(9L) == (9L, 0L))             // no match → self-canonical
  }

  test("weighted sample: inclusion scales with weight; plan is distributed top-k") {
    // 100 light docs (weight ~5) vs 100 heavy docs (weight ~600):
    // priority = u/w, so heavy docs should dominate the k=100 sample.
    val dir = writeDocs(
      (1L to 100L).map(i => (i, "tiny", "en")) ++
        (101L to 200L).map(i => (i, ("long words here " * 40).trim, "en")))
    val df = TextAnalysis.queries("q_weighted_sample")(spark, dir)
    val heavy = df.filter(col("doc_id") > 100L).count()
    assert(heavy >= 90, s"only $heavy heavy docs in sample")
    // Global top-k must be TakeOrderedAndProject, not sort-all + limit.
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("cluster stats: sizes {3,2,1} roll up to one row each") {
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "alpha beta gamma delta epsilon", "en"),
      (3L, "alpha beta gamma delta epsilon", "en"),
      (4L, "one two three four five six", "en"),
      (5L, "one two three four five six", "en"),
      (6L, "totally unrelated content lives here", "en")))
    val r = Dedup.queries("q_cluster_stats")(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("dedup hops: canonicals at 0, direct dups at 1; agrees with fixpoint CC") {
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "alpha beta gamma delta epsilon", "en"),
      (3L, "alpha beta gamma delta epsilon", "en"),
      (6L, "totally unrelated content lives here", "en")))
    val hops = Dedup.queries("q_dedup_hops")(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getInt(2))).toMap
    assert(hops(1L) == (1L, 0) && hops(6L) == (6L, 0)) // canonical + singleton
    assert(hops(2L) == (1L, 1) && hops(3L) == (1L, 1)) // star members
    // Same canonical labels as the fixpoint CC query on the same corpus.
    val cc = Dedup.queries("q_dedup_cc")(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(hops.view.mapValues(_._1).toMap == cc)
  }

  test("tfidf: a term unique to one doc outranks corpus-wide terms") {
    val dir = writeDocs(Seq(
      (1L, "common words here plus zyzzyva", "en"),
      (2L, "common words here plus filler", "en"),
      (3L, "common words here plus filler", "en")))
    val top1 = TextAnalysis.queries("q_tfidf")(spark, dir)
      .filter(col("doc_id") === 1L && col("rnk") === 1)
      .collect().head
    assert(top1.getString(1) == "zyzzyva") // df=1 dominates df=3 terms
  }
}
