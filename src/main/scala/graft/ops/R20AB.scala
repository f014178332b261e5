package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THROWAWAY phase profiler for q199 (untracked). */
object R20AB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    import graft.Tables.documents
    import IndexTables.hashBucket

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      // warm query end-to-end
      t("q199-full") { noop(graft.SparkEntry.queries("q199_exact_dup_probe_index")(spark, sfDir)) }
      spark.catalog.clearCache()
      // pieces
      val fp = t("fingerprint") { IndexTables.dataFingerprint(spark, sfDir) }
      val table = IndexTables.tableName("graft_dedup_idx_v2_", sfDir, fp)
      t("tableExists") { spark.catalog.tableExists(table) }
      val batch = documents(spark, sfDir)
        .filter(hashBucket(col("doc_id").cast("string")) >= "c0")
        .select(col("doc_id"), col("text"))
      t("batch-minhash") { noop(Dedup.withMinhash(batch)
        .select(col("doc_id").as("new_id"), col("sig").as("new_sig"),
          explode(slice(col("bands"), 1, 1)).as("bucket"))) }
      t("index-windowed-scan") {
        import org.apache.spark.sql.expressions.Window
        noop(spark.table(table)
          .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("bucket"))))
          .filter(col("bsz") <= Int.MaxValue).drop("bsz")) }
      t("index-plain-scan") { noop(spark.table(table)) }
      val cands = t("probe-cands") {
        val c = IncrementalDedup.probeBatch(spark, batch, table, threshold = 1.0,
          maxBucket = Int.MaxValue, bandsUsed = 1)
          .select(col("new_id"), col("match_id"))
        noop(c); c
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
