import org.apache.spark.sql.SparkSession
object QDedupBench { def main(a: Array[String]): Unit = {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("WARN")
  val d = "/root/testdata/sf0.1"
  s.range(1<<20).selectExpr("sum(id)").collect()
  s.read.parquet(s"$d/region.parquet").groupBy("r_name").count().count()
  def t(name: String)(f: => Unit): Unit = {
    val t0=System.nanoTime(); f; println(f"[t] $name%-14s ${(System.nanoTime()-t0)/1e9}%.3f s")
    s.catalog.clearCache() }
  for (i <- 1 to 3) {
    t(s"q43 #$i") { graft.ops.Dedup.q43MinhashPairs(s, d).write.mode("overwrite").format("noop").save() }
    t(s"q69 #$i") { graft.ops.Dedup.q69LshClusters(s, d).write.mode("overwrite").format("noop").save() }
  }
  s.stop() } }
