package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session init, parquet reader, codegen framework —
    // otherwise whichever query runs first absorbs ~5 s of one-time cost.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    def pass(): Seq[(String, Double)] = {
      val r = SparkEntry.queries.toSeq.sortBy(_._1).map {
        case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          name -> (System.nanoTime() - t0) / 1e9
      }
      // Drop persisted intermediates at the pass boundary: identical
      // plan subtrees DO share caches within a pass (the production
      // behavior for a multi-query session over materialized
      // intermediates), but accumulation is bounded to one pass and
      // the warm pass starts from a cold cache.
      spark.catalog.clearCache()
      r
    }
    def fmt(results: Seq[(String, Double)]): String =
      results.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    // Cold pass first (the historical numbers — keys unchanged), then a
    // warm pass: cold minus warm ≈ per-query codegen/JIT one-time cost,
    // warm ≈ steady-state throughput. Additive keys only; the driver
    // stores the raw line.
    val results = pass()
    val warm = pass()
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val warmTotal = if (warm.nonEmpty) warm.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results)},"sf":"$sfDir","warm_total":$warmTotal,"warm_queries":${fmt(warm)}}""")
    spark.stop()
  }
}
