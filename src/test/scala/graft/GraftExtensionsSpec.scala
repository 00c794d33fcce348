package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions route: a session created with
  * `withExtensions(new GraftExtensions)` can call every custom
  * expression from plain SQL with no register() call.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions-injected functions are callable from SQL") {
    // Force the shared suite session into existence first, then build a
    // sibling session (same JVM/SparkContext) with the extensions
    // applied — getOrCreate only honors withExtensions when no
    // active/default session is in the way.
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = ext.sql(
        """SELECT poly_hash('the quick brown fox') AS ph,
          |  vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS vd,
          |  shingle_hashes(array('a', 'b', 'c'), 2) AS sh,
          |  lsh_bucket(array(1.0d, -1.0d), array(1.0d, 0.0d, 0.0d, 1.0d))
          |    AS lb,
          |  nfc_normalize('e\u0301clair') AS nn""".stripMargin)
        .collect().head
      assert(row.getLong(0) == graft.functions.PolyHash.hash("the quick brown fox"))
      assert(row.getDouble(1) == 32.0)
      assert(row.getSeq[Long](2) == Seq(
        graft.functions.PolyHash.hash("a b"),
        graft.functions.PolyHash.hash("b c")))
      // plane 0 = (1,0) → dot 1 >= 0 → bit 0; plane 1 = (0,1) → dot -1 → no bit
      assert(row.getLong(3) == 1L)
      // decomposed e + U+0301 composes to precomposed U+00E9
      assert(row.getString(4) == "\u00e9clair")

      // optimizer rule: levenshtein(a,b) <= k rewritten to the banded
      // threshold form levenshtein(a,b,k) >= 0 (parquet-backed source —
      // a LocalRelation would be constant-folded before we could look)
      import org.apache.spark.sql.functions._
      val part = Tables.part(ext, sf())
      val filtered = part
        .filter(levenshtein(col("p_name"), lit("small ring")) <= 3)
      val opt = filtered.queryExecution.optimizedPlan.toString
      assert(opt.contains("Some(3)) >= 0"), s"threshold not pushed:\n$opt")
      // and semantics are unchanged vs the un-optimized base session
      val expected = Tables.part(base, sf())
        .filter(levenshtein(col("p_name"), lit("small ring")) <= 3)
        .select("p_partkey").collect().map(_.getLong(0)).toSet
      assert(filtered.select("p_partkey").collect().map(_.getLong(0)).toSet
        == expected && expected.nonEmpty)

      // wrong arity fails analysis with a clear message, not an
      // IndexOutOfBoundsException from the builder body
      val err = intercept[Exception] {
        ext.sql("SELECT vec_dot(array(1.0d)) AS bad").collect()
      }
      assert(err.getMessage.contains("Invalid number of arguments"),
        s"unexpected error: ${err.getMessage}")
      assert(err.getMessage.contains("vec_dot"))

      // a REGISTERED oracle query runs end-to-end on this extension
      // surface (q_sql_surface is plain SQL whose poly_hash resolves
      // only through the injection — no register() call on its path),
      // and its fingerprints agree with the programmatic expression
      val surf = SparkEntry.queries("q_sql_surface")(ext, sf())
        .collect()
      assert(surf.nonEmpty)
      assert(surf.map(_.getAs[Long]("n_docs")).sum ==
        Tables.documents(ext, sf()).count())
      val oneDoc = Tables.documents(ext, sf())
        .select("doc_id", "text").collect().head
      val oneHash = graft.functions.PolyHash.hash(
        oneDoc.getString(1).toLowerCase)
      assert(surf.exists(r => r.getAs[Long]("h") == oneHash))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
