package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV cardinality — the online counterpart of the batch
  * `q_kmv_distinct` sketch (`graft.llm.Sketches`): a stream of
  * documents maintains "how many distinct texts have we seen" in O(K)
  * state, emitting an updated per-shard sketch every batch.
  *
  * Construction, and why it scales:
  *  - **Sharded state, not one global key.** A single grouping key
  *    would funnel every row through one task — the classic streaming
  *    cardinality mistake. Hashes are sharded by `h mod NSHARDS`;
  *    each shard's state is its own K smallest distinct hashes, so
  *    both the shuffle and the state store spread across the cluster.
  *  - **Merge at read time is exact.** The global K minima are always
  *    a subset of the union of per-shard K minima (each global
  *    minimum ranks ≤ K within its own shard a fortiori), so merging
  *    shard sketches reproduces the batch sketch BIT-FOR-BIT — the
  *    estimate is the batch estimate, not an approximation of an
  *    approximation ([[StreamingKmvSpec]] pins this parity).
  *  - **O(K·NSHARDS) state forever.** The stream can run over 100 TB
  *    and state never exceeds NSHARDS sorted arrays of K longs.
  *
  * Mergeability is the same property that makes KMV a distributed
  * sketch in batch (per-partition top-K then global top-K); here it
  * buys shard parallelism plus cheap snapshot reads.
  */
object StreamingKmv {

  /** Per-shard sketch snapshot: the shard's K smallest distinct
    * hashes (ascending) and how many rows it has absorbed.
    */
  case class ShardSketch(shard: Int, n_rows: Long, minima: Seq[Long])

  /** Internal row shape for the sharded hash stream (public: encoder
    * codegen must instantiate it).
    */
  case class HashRow(shard: Int, h: Long)

  val K = 256
  val NSHARDS = 32
  private val P = 1000000007L

  /** Updated per-shard sketches from a stream with a `text` column.
    * OutputMode Update: each batch re-emits only the shards it
    * touched; the latest row per shard is the current sketch.
    */
  def shardSketches(docs: DataFrame, k: Int = K): Dataset[ShardSketch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.PolyHash.register(spark)
    docs
      .select(graft.llm.Sketches.mixed(
        graft.functions.PolyHash.poly_hash(col("text"))).as("h"))
      .select((col("h") % NSHARDS).cast("int").as("shard"), col("h"))
      .as[HashRow]
      .groupByKey(_.shard)
      .mapGroupsWithState[(Long, Vector[Long]), ShardSketch](
        GroupStateTimeout.NoTimeout) {
        (shard: Int, batch: Iterator[HashRow], state: GroupState[(Long, Vector[Long])]) =>
          val (seen, minima0) = state.getOption.getOrElse((0L, Vector.empty[Long]))
          var minima = minima0
          var n = seen
          batch.foreach { r =>
            n += 1
            // sorted-insert iff new and within the K minima; a hash
            // beyond the current K-th is dropped immediately (the
            // common case once the sketch saturates — O(log K) probe,
            // no growth).
            val idx = binarySearch(minima, r.h)
            if (idx < 0) {
              val at = -idx - 1
              if (at < k) {
                minima = (minima.take(at) :+ r.h) ++ minima.drop(at)
                if (minima.size > k) minima = minima.take(k)
              }
            }
          }
          state.update((n, minima))
          ShardSketch(shard, n, minima)
      }
  }

  private def binarySearch(v: Vector[Long], x: Long): Int = {
    var lo = 0; var hi = v.size - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = v(mid)
      if (m == x) return mid
      else if (m < x) lo = mid + 1
      else hi = mid - 1
    }
    -(lo + 1)
  }

  /** Merge the LATEST snapshot per shard into the global estimate —
    * identical arithmetic to the batch `q_kmv_distinct`. Batch-side
    * helper over a sketch-snapshot frame (e.g. a memory/Delta sink):
    * explode minima, global K smallest (TakeOrderedAndProject), KMV
    * formula.
    */
  def mergedEstimate(snapshots: Dataset[ShardSketch], k: Int = K): DataFrame = {
    val spark = snapshots.sparkSession
    import spark.implicits._
    val merged = snapshots.toDF()
      .select(explode(col("minima")).as("h"))
      .distinct()
      .orderBy(col("h")).limit(k)
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_min"))
    merged
      .withColumn("est_distinct",
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr(s"(${k - 1} * ${P}L) div kth_min")))
  }
}
