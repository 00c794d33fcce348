package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the streaming counterpart of
  * the batch MinHash pipeline (`graft.llm.Dedup`): documents arrive on
  * a stream and candidate near-dup pairs are emitted as soon as a new
  * document lands in a band bucket an earlier document already
  * occupies.
  *
  * Construction differences from batch, both forced by streaming
  * semantics and both scale-relevant:
  *  - **Map-only signatures.** Batch computes the K min-hashes with
  *    explode + partial-aggregating groupBy; a streaming aggregation
  *    would need a watermark and delay output. Here each signature is
  *    `array_min(transform(shingle_hashes(...), h → h_i(h)))` — K
  *    codegen'd folds per document, zero state, zero shuffle, same
  *    values (min over duplicates = min over distinct).
  *  - **Stateful band buckets replace the self-join.** Batch
  *    self-joins band keys; a stream cannot join itself without
  *    buffering both sides anyway, so the bucket membership IS the
  *    state: `groupByKey(band‖key)` + per-bucket member list. New
  *    member → emit one pair per existing member. State per bucket is
  *    capped at `maxPerBucket` (an over-full bucket means the band
  *    key is degenerate — the pairs beyond the cap are noise, and the
  *    cap bounds state growth on a 100 TB stream).
  *
  * A pair may be emitted once per shared band (batch dedupes with
  * `distinct()`); downstream exact verification is idempotent, so
  * per-band duplicates are harmless — or dedupe post-hoc in batch.
  */
object StreamingDedup {

  // Hash family, K, and band construction come from the batch module —
  // batch/streaming candidate parity holds by construction, not by
  // keeping two copies in sync (StreamingDedupSpec asserts it anyway).
  import graft.llm.Dedup.{bandStructCols, minhashFn, K, ROWS_PER_BAND}

  /** Candidate pair: doc_b arrived while doc_a was already in the
    * bucket (doc_a < doc_b after normalization).
    */
  case class CandidatePair(doc_a: Long, doc_b: Long, band: Int)

  /** Internal row shape for the band-bucket stream (public: encoder
    * codegen must instantiate it).
    */
  case class BandHit(bucket: String, band: Int, docId: Long)

  /** Map-only MinHash signature columns off a text column — value-
    * identical to `Dedup.minhashSignatures` (min is duplicate-
    * insensitive), but computed per-row with no shuffle.
    */
  def signatureCols(text: Column): Seq[Column] = {
    val hashes = graft.functions.ShinglePolyHash.shingle_hashes(
      split(lower(text), " "), lit(3))
    (0 until K).map(i =>
      array_min(transform(hashes, h => minhashFn(h, i))).as(s"sig$i"))
  }

  /** Streaming candidate pairs from a (doc_id, text) stream. */
  def candidatePairs(docs: DataFrame, maxPerBucket: Int = 64)
      : Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.ShinglePolyHash.register(spark)

    val sigs = docs.select(
      (col("doc_id") +: signatureCols(col("text"))): _*)
    val hits = sigs
      // docs with no shingles have Long.MaxValue-free null mins; drop
      .filter(col("sig0").isNotNull)
      .select(col("doc_id"),
        explode(array(bandStructCols(K, ROWS_PER_BAND): _*)).as("bk"))
      .select(concat_ws("|", col("bk.band"), col("bk.key")).as("bucket"),
        col("bk.band").as("band"), col("doc_id").as("docId"))
      .as[BandHit]

    hits
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[Long], CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: String, batch: Iterator[BandHit], state: GroupState[List[Long]]) =>
          val band = bucket.takeWhile(_ != '|').toInt
          var members = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[CandidatePair]()
          // deterministic intra-batch order
          batch.toList.sortBy(_.docId).foreach { h =>
            if (!members.contains(h.docId)) {
              members.iterator.take(maxPerBucket).foreach { prior =>
                out += CandidatePair(
                  math.min(prior, h.docId), math.max(prior, h.docId), band)
              }
              if (members.size < maxPerBucket) members = h.docId :: members
            }
          }
          state.update(members)
          out.iterator
      }
  }
}
