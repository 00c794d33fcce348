package graft.llm

import graft.SparkSpec

import java.nio.file.Files

/** Pins the on-disk index tier (`graft.IndexTier`, round-9 verdict
  * #8): build-if-absent writes the index parquet, a FRESH session
  * scans it instead of rebuilding, and tier on/off cannot change any
  * query's rows. Uses the two index families the verdict named —
  * the dedup verified-pair table and the NSW graph.
  */
class IndexTierSpec extends SparkSpec {

  private def rows(q: String, s: org.apache.spark.sql.SparkSession,
      d: String): Seq[String] =
    graft.SparkEntry.queries(q)(s, d).collect()
      .map(_.toString).sorted.toSeq

  test("tier on/off yields identical rows and a fresh session scans, not rebuilds") {
    val d = sf() // sf0.001
    val queries = Seq("q_dedup_fuzzy", "q_band_shape", "q_ann_beam")

    def resetMemos(): Unit = {
      graft.llm.Dedup.invalidate(d)
      graft.llm.Similarity.invalidate(d)
    }

    // Baseline: tier off (no root configured).
    assert(graft.IndexTier.rootDir.isEmpty,
      "test requires no ambient GRAFT_INDEX_DIR")
    resetMemos()
    val off = queries.map(q => q -> rows(q, spark, d)).toMap

    val root = Files.createTempDirectory("graft_index_spec").toString
    System.setProperty("graft.index.dir", root)
    try {
      resetMemos() // also clears any stale disk tier under root
      val on1 = queries.map(q => q -> rows(q, spark, d)).toMap
      queries.foreach(q => assert(on1(q) == off(q), s"$q: tier-on " +
        "rows differ from tier-off"))
      // The named index tables exist on disk with complete writes.
      val sfx = d.replaceAll("[^A-Za-z0-9._-]", "_")
      Seq("dedup_versup", "dedup_verpairs", "nsw_graph").foreach { n =>
        assert(new java.io.File(s"$root/$sfx/$n.parquet/_SUCCESS")
          .exists(), s"$n not written")
      }
      // A FRESH session (new memo key) must serve the same rows from
      // the disk tier. Scan-if-present is pinned by mtime: the index
      // files must not be rewritten by the second session.
      val mtimes = Seq("dedup_versup", "nsw_graph").map { n =>
        n -> new java.io.File(s"$root/$sfx/$n.parquet/_SUCCESS")
          .lastModified()
      }
      val s2 = spark.newSession()
      val on2 = queries.map(q => q -> rows(q, s2, d)).toMap
      queries.foreach(q => assert(on2(q) == off(q), s"$q: fresh-" +
        "session tier rows differ"))
      mtimes.foreach { case (n, t) =>
        assert(new java.io.File(s"$root/$sfx/$n.parquet/_SUCCESS")
          .lastModified() == t, s"$n was rebuilt, not scanned")
      }
      // invalidate drops the disk tier.
      graft.llm.Dedup.invalidate(d)
      assert(!new java.io.File(s"$root/$sfx/dedup_versup.parquet")
        .exists(), "invalidate left the disk index behind")
    } finally {
      System.clearProperty("graft.index.dir")
      resetMemos()
    }
  }
}
