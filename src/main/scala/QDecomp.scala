import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object QDecomp { def main(a: Array[String]): Unit = {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("WARN")
  val d = "/root/testdata/sf0.1"
  def t[T](name: String)(f: => T): T = {
    val t0=System.nanoTime(); val r=f; println(f"[t] $name%-24s ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
  s.range(1<<20).selectExpr("sum(id)").collect()
  s.read.parquet(s"$d/region.parquet").groupBy("r_name").count().count()
  val rnd = "/tmp/qdecomp_idx_" + System.nanoTime()
  val fp = t("fingerprint") { val m=graft.ops.Ivf.getClass.getDeclaredMethod("dataFingerprint", classOf[SparkSession], classOf[String]); m.setAccessible(true); m.invoke(graft.ops.Ivf, s, d) }
  val emb = s.read.parquet(s"$d/embeddings.parquet")
  t("trainCentroids") { graft.ops.Ivf.trainCentroids(emb.select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))) }
  t("writeIndex full") { graft.ops.Ivf.writeIndex(s, d, rnd) }
  t("probe after build") { val q = emb.filter(col("vec_id")===0).select(col("embedding").cast("array<double>")).head().getSeq[Double](0);
    graft.ops.Ivf.probeIndex(s, rnd, q, 8, excludeVecId=Some(0L)).write.mode("overwrite").format("noop").save() }
  s.stop() } }
