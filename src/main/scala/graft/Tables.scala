package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take a `dir` (scale-factor directory) and read parquet
  * lazily — Catalyst pushes filters/projections down to the scan, so a
  * query that touches 2 columns reads 2 columns. At 100 TB the same
  * code reads a partitioned table; nothing here assumes data fits in
  * memory.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` arrives in whatever parquet timestamp flavor the data
    * generator used — TIMESTAMP(NANOS) (older drops; Spark's vectorized
    * reader rejects it, so it is read as a long via the legacy conf and
    * truncated to micros) or TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (current drops; Spark infers TIMESTAMP_NTZ). Both are normalized
    * to session-TZ TIMESTAMP here: the session runs in UTC
    * ([[GraftSession]]), so reinterpreting the naive wall-clock as UTC
    * is exactly DuckDB's treatment of a naive timestamp in epoch
    * functions — oracle comparison stays bit-identical. Integer `div`
    * (not `/`) because ns-since-epoch exceeds double's 2^53 exact
    * range.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the full engine surface is
    * also reachable through `spark.sql(...)` — the SQL layer the
    * reference lacks entirely (SURVEY.md §0).
    */
  def registerViews(s: SparkSession, d: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else table(s, d, n)
      df.createOrReplaceTempView(n)
    }
}
