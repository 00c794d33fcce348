package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Write-layout operators — how a 100 TB table is laid out on disk
  * decides what a scan can skip.
  *
  * [[writeClustered]] range-partitions on the clustering key and sorts
  * within each partition before writing, so every output file covers a
  * DISJOINT key range: a point/range predicate on the key then prunes
  * to a handful of files via parquet min/max statistics, without any
  * partition directories. This is the single-column form of the
  * Z-order/clustering layouts lakehouse formats apply; combine with
  * `partitionBy` (directory pruning, see FileFormatsSpec) and
  * `bucketBy` (shuffle-free joins, see BucketingSpec) for the full
  * layout toolkit.
  */
object Layout {

  def writeClustered(df: DataFrame, clusterCol: Column, path: String,
      files: Int = 8): Unit =
    df.repartitionByRange(files, clusterCol)
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)
}
