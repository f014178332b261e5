package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench for individual queries: runMain graft.QBench <name>...
  * Runs each query twice (cold + warm) at SPARK_GRAFT_SF_DIR. */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      (1 to 2).foreach { it =>
        val t0 = System.nanoTime()
        // same materialization as Bench: noop write evaluates all columns
        SparkEntry.queries(q)(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"QBENCH $q iter$it ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
