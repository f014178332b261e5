package graft

import org.apache.spark.sql.SparkSession

/** Throwaway micro-bench for the r19 optimization round: min-of-N
  * per query inside one warm JVM, with the Bench calibration probe
  * printed per rep so box-state drift is visible next to each number.
  * Usage: runMain graft.Phases <reps> <query>...
  */
object Phases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q105_logreg_quality", "q97_kmeans", "q187_pagerank")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def calib(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 24).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { q =>
      val times = (1 to reps).map { i =>
        val c = calib()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"REP $q rep$i $dt%.3f s (calib $c%.3f)")
        dt
      }
      println(f"MIN $q ${times.min}%.3f s over $reps reps")
    }
    spark.stop()
  }
}
