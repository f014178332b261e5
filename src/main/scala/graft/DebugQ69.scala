package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the q69 slowdown (round 5). */
object DebugQ69 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DBG $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { iter =>
      println(s"=== iter $iter")
      val pairs = ops.Dedup.minhashCandidatePairs(spark, sfDir)
        .filter(col("est_jaccard") >= 0.9)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val nPairs = t("pairs.count")(pairs.count())
      println(s"DBG nPairs=$nPairs")
      val docs = Tables.documents(spark, sfDir)
      // inline the connectedComponents loop with per-round timing
      import org.apache.spark.sql.graftbridge.PlanBridge
      val p = pairs.persist()
      val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst"))).persist()
      val nEdges = t("edges.count")(edges.count())
      println(s"DBG nEdges=$nEdges")
      var labels = docs.select(col("doc_id").as("id"), col("doc_id").as("label"))
      var prevChk: DataFrame = null
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 25) {
        t(s"round $rounds") {
          val chk = edges.join(labels, edges("src") === labels("id"))
            .select(col("dst").as("id"), col("label"), lit(null).cast("long").as("old"))
            .union(labels.select(col("id"), col("label"), col("label").as("old")))
            .groupBy(col("id"))
            .agg(min(col("label")).as("label"), max(col("old")).as("old"))
            .localCheckpoint()
          changed = chk.filter(col("label") =!= col("old")).count()
          if (prevChk != null) PlanBridge.releaseLocalCheckpoint(prevChk)
          prevChk = chk
          labels = chk.select(col("id"), col("label"))
          rounds += 1
        }
        println(s"DBG   changed=$changed")
      }
      edges.unpersist(); p.unpersist()
      spark.catalog.clearCache()
      val rt = Runtime.getRuntime
      println(s"DBG heapUsedMB=${(rt.totalMemory - rt.freeMemory) / 1024 / 1024}")
    }
    spark.stop()
  }
}
