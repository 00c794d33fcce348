package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan (and optionally run) registered
  * queries — the `.explain("formatted")` feedback loop as a main.
  *
  * Usage: runMain graft.tools.ExplainQ <sfDir> <name>[,<name>...]
  *        [run] [formatted]
  * `run` executes each query first so AQE final plans (reused
  * exchanges, runtime join strategy flips) are what gets printed.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val doRun = args.contains("run")
    val formatted = args.contains("formatted")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      if (doRun) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      if (formatted) df.explain("formatted")
      else println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
