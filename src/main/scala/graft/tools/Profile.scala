package graft.tools

import graft.SparkEntry

/** Warm-JVM per-query timing: run each named query twice and report
  * both (first = plan+JIT+IO cold, second = steady state).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[4]",
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-18s cold=${times.head}%6.2fs warm=${times(1)}%6.2fs")
    }
    spark.stop()
  }
}
