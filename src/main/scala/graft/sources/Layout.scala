package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-layout operators — how a 100 TB table is laid out on disk
  * decides what a scan can skip.
  *
  * [[writeClustered]] range-partitions on ONE clustering key and sorts
  * within each partition before writing, so every output file covers a
  * DISJOINT key range: a point/range predicate on the key then prunes
  * to a handful of files via parquet min/max statistics, without any
  * partition directories.
  *
  * [[writeZOrdered]] generalizes to TWO columns with a Morton (bit-
  * interleave) curve: each column is min/max-scaled to a 16-bit grid
  * coordinate, the bits are interleaved into one z-value, and the
  * table is range-partitioned + sorted by that z-value. Because the
  * curve is locality-preserving in BOTH dimensions, every output file
  * covers a bounded sub-rectangle of (a, b) space — so min/max file
  * skipping works for predicates on EITHER column, where single-column
  * clustering prunes only its own key. This is the clustering layout
  * lakehouse formats apply before large scans; combine with
  * `partitionBy` (directory pruning, see FileFormatsSpec) and
  * `bucketBy` (shuffle-free joins, see BucketingSpec) for the full
  * layout toolkit.
  *
  * Scale note: the only extra cost over a plain clustered write is one
  * scalar min/max aggregate to fix the grid (no global sort, no
  * window) — the z-value itself is a codegen'd bitwise expression and
  * the shuffle is the same range partitioning a clustered write pays.
  */
object Layout {

  def writeClustered(df: DataFrame, clusterCol: Column, path: String,
      files: Int = 8): Unit =
    df.repartitionByRange(files, clusterCol)
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)

  /** Spread the low 16 bits of `x` to the even bit positions (Morton
    * magic-number construction; codegen-friendly bitwise ops only).
    */
  private[sources] def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Min/max-scale `c` onto the 16-bit grid [0, 65535]. */
  private def gridCoord(c: Column, lo: Double, hi: Double): Column =
    if (hi == lo) lit(0L)
    else least(greatest(
      (c.cast("double") - lit(lo)) * 65535.0 / (hi - lo), lit(0.0)),
      lit(65535.0)).cast("long")

  /** The interleaved z-value of two grid coordinates. */
  private[sources] def zValue(ga: Column, gb: Column): Column =
    spread16(ga).bitwiseOR(shiftleft(spread16(gb), 1))

  /** Z-ordered two-column clustered write: range-partition + sort by
    * the Morton value of (a, b). One scalar aggregate fixes the grid;
    * everything else is map-side expression work plus the same range
    * shuffle a single-column clustered write pays.
    */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, path: String,
      files: Int = 8): Unit = {
    val r = df.agg(
      min(a.cast("double")), max(a.cast("double")),
      min(b.cast("double")), max(b.cast("double"))).head()
    if (r.isNullAt(0)) {
      // empty input: nothing to cluster, write the empty frame as-is
      df.write.mode("overwrite").parquet(path)
      return
    }
    val z = zValue(
      gridCoord(a, r.getDouble(0), r.getDouble(1)),
      gridCoord(b, r.getDouble(2), r.getDouble(3)))
    df.withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the maintenance pass every streaming or
    * incremental writer eventually owes: a table that accretes one
    * file per micro-batch/task degrades every later scan (per-file
    * open/footer costs, tiny row groups defeating min/max skipping,
    * driver memory for file listings). Rewrites `inPath` into
    * `outPath` with file count sized from the ACTUAL on-disk bytes
    * (ceil(total/targetBytes)), so output files land near the target
    * regardless of how fragmented the input was.
    *
    * Write-to-new-path, not in-place: the swap (rename/metadata
    * commit) stays with the caller's table format, and a failed
    * compaction leaves the original untouched — the idempotent
    * pattern `Sinks.upsertSnapshot` uses for its versioned swaps.
    *
    * Scale: one file-listing on the driver (names+sizes only), one
    * read→round-robin-repartition→write; no sort, no skew (round
    * robin spreads rows evenly regardless of input file sizes). Use
    * [[writeClustered]]/[[writeZOrdered]] instead when the rewrite
    * should ALSO fix ordering — compaction proper preserves nothing
    * and costs nothing beyond the copy.
    *
    * Returns (input file count, output file count).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long = 128L * 1024 * 1024)
      : (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(hPath).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(
      totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    (dataFiles.size, nOut)
  }
}
