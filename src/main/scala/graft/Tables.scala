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

  /** Resolved-relation memo (optimization round 13). `spark.read.parquet`
    * re-lists the table directory and re-reads a parquet footer for
    * schema inference on EVERY call — driver-side, single-threaded work
    * inside each query's construction. The corpus dirs are immutable
    * for a session's lifetime, so the resolved DataFrame (a lazy
    * logical plan — no rows, no results) is reusable: one resolution
    * per (session, table path) instead of one per query construction.
    * Measured at sf0.1: steady-state plan construction for the 252
    * registered queries 42.8 s → (see OPTIMIZATION_r13.md) with no
    * change to any executed plan — the memoized object is exactly the
    * DataFrame the direct call would return.
    *
    * Keys are WEAK on the session (cold pass 2 and tests spin up many
    * sessions; entries die with them). The value memo additionally
    * keys on the file-level fingerprint of the table path (length +
    * mtime of the file, or of every direct child for a directory), so
    * a table REWRITTEN IN PLACE mid-session — integration tests do
    * this — resolves fresh rather than serving a stale file index.
    */
  private val relMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private def pathStamp(p: java.io.File): String =
    if (p.isDirectory)
      Option(p.listFiles()).getOrElse(Array.empty)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .sorted.mkString(",")
    else s"${p.length}:${p.lastModified}"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = s"$path@${pathStamp(new java.io.File(path))}"
    val perSession = relMemo.synchronized {
      var m = relMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        relMemo.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(key, _ => spark.read.parquet(path))
  }

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
