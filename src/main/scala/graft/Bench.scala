package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  * Queries run in sorted-name order; a failed query contributes its
  * elapsed time and is reported on stderr (never corrupts the JSON). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: exercise codegen, shuffle, and the parquet reader
    // once so the first timed query measures the query, not JVM warmup
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop-format write: materializes EVERY output column through the
      // full plan (a count() would let Catalyst prune unreferenced
      // projections, flattering map-only queries) without sink IO cost
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that cache intermediates (sketch/signature frames) must
      // not leak executor memory into the next measurement
      spark.catalog.clearCache()
      dt
    }
    // This box has noisy neighbors: a roaming multi-minute burst can
    // inflate a CONTIGUOUS window of queries 20-50× (observed q20
    // 0.6s → 80s with identical plans). Every query gets the SAME
    // estimator — two full sweeps with min() — so no query keeps a
    // single possibly-noisy sample; the second sweep runs AFTER the
    // whole first one (temporal separation ≈ one suite length), so one
    // burst can't inflate both measurements of the same query.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val firstPass = ordered.map { case (name, fn) => name -> timeOnce(name, fn) }
    val secondPass = ordered.map { case (name, fn) => name -> timeOnce(name, fn) }
    val results = firstPass.zip(secondPass).map { case ((name, t1), (_, t2)) =>
      name -> math.min(t1, t2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
