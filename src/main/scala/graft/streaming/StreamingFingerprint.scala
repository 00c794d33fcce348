package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming substring-duplication detection — the streaming twin of
  * the batch winnowed-fingerprint audit (`q_substring_dup` in
  * [[graft.llm.Tokenization]]): documents arrive on a stream, each is
  * fingerprinted map-side (O(n) rolling window hashes, content-keyed
  * winnow selection — the SAME kernel as batch, so fingerprints are
  * value-identical), and a match is emitted the moment a document
  * carries a fingerprint an earlier document already registered.
  *
  * This is the ingestion-time form of suffix-array-style dedup: a
  * crawler pipeline rejects (or routes to review) a document whose
  * verbatim spans are already in the corpus WITHOUT re-running a
  * corpus-wide batch join. State is the fingerprint registry itself —
  * keyed by hash, a bounded member list per key ([[FpMatch]]es beyond
  * `maxPerHash` are degenerate boilerplate, and the cap bounds state
  * on a 100 TB stream exactly like the batch query's frequency-bounded
  * boilerplate set).
  */
object StreamingFingerprint {

  /** One selected fingerprint occurrence. (Public: encoder codegen
    * must instantiate it.)
    */
  case class FpHit(h: Long, docId: Long)

  /** doc_b arrived while doc_a already held fingerprint h
    * (doc_a < doc_b after normalization).
    */
  case class FpMatch(doc_a: Long, doc_b: Long, h: Long)

  /** Streaming fingerprint matches from a (doc_id, text) stream.
    * Window width / winnow modulus default to the batch audit's
    * parameters so batch/streaming parity holds by construction.
    */
  def matches(docs: DataFrame, winChars: Int = 32, winnowMod: Int = 16,
      maxPerHash: Int = 8): Dataset[FpMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.RollingHashWindows.register(spark)

    val hits = docs
      .select(col("doc_id"), explode(expr(
        s"filter(rolling_hashes(text, $winChars)," +
          s" h -> h % $winnowMod = 0)")).as("h"))
      .select(col("h"), col("doc_id").as("docId"))
      .as[FpHit]

    hits
      .groupByKey(_.h)
      .flatMapGroupsWithState[List[Long], FpMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (h: Long, batch: Iterator[FpHit], state: GroupState[List[Long]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[FpMatch]()
          // deterministic intra-batch order
          batch.toList.sortBy(_.docId).foreach { hit =>
            if (!members.contains(hit.docId)) {
              members.iterator.take(maxPerHash).foreach { prior =>
                out += FpMatch(
                  math.min(prior, hit.docId), math.max(prior, hit.docId), h)
              }
              if (members.size < maxPerHash) members = hit.docId :: members
            }
          }
          state.update(members)
          out.iterator
      }
  }
}
