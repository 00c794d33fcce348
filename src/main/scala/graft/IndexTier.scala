package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optional ON-DISK tier for the one-time index builds (round-9
  * verdict #8). The session memos in [[graft.llm.Dedup]] /
  * [[graft.llm.Similarity]] already treat the verified near-dup pair
  * table and the NSW k-NN graph as "the maintained table a production
  * index job writes once" — but a FRESH session still paid the full
  * rebuild (q_band_shape 54 s, q_ann_beam 7.3 s cold at sf1). This
  * makes the claim literal: with a root directory configured, each
  * index build is written to parquet on first use (build-if-absent)
  * and every later session scans it (scan-if-present) — a fresh
  * session pays a parquet scan, not a rebuild, exactly the
  * deployment reality of an index job + search sessions.
  *
  * Off by default: with no root configured (`graft.index.dir` system
  * property or `GRAFT_INDEX_DIR` env), [[cached]] degrades to the
  * eager `localCheckpoint` the memos used before — same values,
  * session-local lifetime. The parquet round-trip is exact for every
  * column type these indexes carry (long/double/string/arrays), so
  * tier on/off cannot change a query's result, only where the bytes
  * come from. A half-written index (crash mid-job) is never read:
  * presence is detected via the `_SUCCESS` marker the parquet
  * committer writes last.
  *
  * Consumers joining a tiered frame also get SIZE STATISTICS (a
  * parquet scan has them; a checkpoint scan does not) — the
  * verPairsMemo lesson in reverse: small index tables broadcast
  * instead of sort-merging.
  */
object IndexTier {

  def rootDir: Option[String] =
    sys.props.get("graft.index.dir").orElse(sys.env.get("GRAFT_INDEX_DIR"))
      .filter(_.nonEmpty)

  private def sanitize(d: String): String =
    d.replaceAll("[^A-Za-z0-9._-]", "_")

  private def indexPath(root: String, d: String, name: String): String =
    s"$root/${sanitize(d)}/$name.parquet"

  /** Build-if-absent / scan-if-present when a tier root is
    * configured; eager localCheckpoint otherwise. `name` must be
    * unique per logical index within the corpus dir.
    */
  def cached(s: SparkSession, d: String, name: String)
      (build: => DataFrame): DataFrame =
    rootDir match {
      case None => build.localCheckpoint(true)
      case Some(root) =>
        val path = indexPath(root, d, name)
        if (!new java.io.File(path, "_SUCCESS").exists())
          build.write.mode("overwrite").parquet(path)
        s.read.parquet(path)
    }

  /** [[cached]], then pinned HOT: when the tier is on, the parquet
    * scan is eagerly localCheckpointed so the session serves repeat
    * consumers from block-manager memory. For frames a single query
    * rescans many times (the HITS edge list is scanned four times per
    * run), re-decoding parquet per scan measurably loses to memory
    * blocks (q_hits sf1 warm 2.3 -> 5.0 s on the scan-only tier);
    * the checkpoint restores warm speed while the disk tier still
    * turns a fresh session's rebuild into a scan.
    */
  def cachedHot(s: SparkSession, d: String, name: String)
      (build: => DataFrame): DataFrame = {
    val scan = cached(s, d, name)(build)
    if (rootDir.isDefined)
      // Re-spread before pinning: a small parquet index packs into
      // one or two scan splits, which would serialize every
      // downstream stage that starts from the checkpoint.
      scan.repartition(s.sessionState.conf.numShufflePartitions)
        .localCheckpoint(true)
    else scan
  }

  /** Delete the on-disk indexes for `d` — the disk half of the
    * corpus-memo `invalidate(dir)` contract (corpus rewritten in
    * place ⇒ every derived materialization is stale).
    */
  def invalidate(d: String): Unit =
    rootDir.foreach { root =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(s"$root/${sanitize(d)}"))
    }
}
