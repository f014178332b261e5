package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 plan-evidence rig: dumps `explain("formatted")` for the
  * INTERNAL frames of queries whose public result hides the physical
  * plan behind a bounded collect+parallelize or a localCheckpoint
  * (q174's grading digest, the iterative fits). Regular queries are
  * dumped by [[ExplainAudit]]; this rig exists so the committed
  * after-dumps under plans/r20 are reproducible from HEAD:
  * `runMain graft.R20Plans <outFile> <name>`.
  *
  * Where a frame below elides a checkpoint/cache boundary, it elides
  * it for BOTH the before and after dumps of that query, so the
  * exchange/window counts stay comparable. */
object R20Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    /** q174's ranking core: the ONE window pass that replaced the old
      * form's len(dims)+1 separate windows. At runtime this subtree
      * executes exactly once, into a localCheckpoint ≤ (len(dims)+1) ×
      * nQueries × k rows. */
    def q174Ranking(): DataFrame =
      graft.ops.Similarity.truncationTopK(
        graft.Tables.embeddingVectors(spark, sfDir).select(col("vec_id"), col("e")),
        nQueries = 8, dims = Seq(8, 16, 32, 64), k = 10)

    /** q174's grading digest over the REAL checkpointed ranking (as the
      * production query runs it): every downstream join reads the
      * bounded Scan ExistingRDD, not a re-derivation of the ranking. */
    def q174Grading(): DataFrame = {
      val nQueries = 8; val dims = Seq(8, 16, 32, 64); val k = 10
      val vecs = graft.Tables.embeddingVectors(spark, sfDir)
        .select(col("vec_id"), col("e"))
      val queries = vecs.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      val topk = graft.ops.Similarity.truncationTopK(vecs, nQueries, dims, k)
        .localCheckpoint()
      val exact = topk.filter(col("lvl") === -1).select(col("qid"), col("vec_id"))
      val perDim = topk.filter(col("lvl") =!= -1)
        .select(col("lvl").as("dims"), col("qid"), col("vec_id"))
      val nExact = exact.groupBy(col("qid")).agg(count(lit(1)).as("n_exact"))
      val grid = queries.select(col("qid"), explode(typedLit(dims)).as("dims"))
      val matches = perDim.join(exact, Seq("qid", "vec_id"))
        .groupBy(col("dims"), col("qid")).agg(count(lit(1)).as("n_match"))
      grid.join(matches, Seq("dims", "qid"), "left").na.fill(0L, Seq("n_match"))
        .join(nExact, Seq("qid"), "left").na.fill(0L, Seq("n_exact"))
        .select(col("dims"),
          when(col("n_exact") === 0, lit(1.0))
            .otherwise(col("n_match").cast("double") / col("n_exact")).as("recall"))
        .groupBy(col("dims"))
        .agg(count(lit(1)).as("n_queries"),
             round(avg(col("recall")), 4).as("mean_recall"),
             round(min(col("recall")), 4).as("min_recall"))
        .orderBy(col("dims"))
    }

    /** q187's fused transition build (checkpoint elided): ONE job that
      * aggregates the flow digest, derives both node-domain
      * normalizers from it (exchange-reused), and attaches them
      * map-side. Replaces the old flow-ckpt + union + groupBy(src) +
      * trans-ckpt pair of edge-domain materializations. */
    def q187FlowT(): DataFrame = {
      import graft.Tables._
      val li = lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
      val ord = orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
      val flow = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("w"))
      val cSum = flow.groupBy(col("o_custkey")).agg(sum(col("w")).as("wc"))
      val sSum = flow.groupBy(col("l_suppkey")).agg(sum(col("w")).as("ws"))
      flow.join(broadcast(cSum), Seq("o_custkey"))
        .join(broadcast(sSum), Seq("l_suppkey"))
        .select(col("o_custkey"), col("l_suppkey"),
          (col("w").cast("double") / col("wc")).as("p_from_cust"),
          (col("w").cast("double") / col("ws")).as("p_from_supp"))
    }

    val frames: Map[String, () => DataFrame] = Map(
      "q174_ranking" -> (() => q174Ranking()),
      "q174_grading" -> (() => q174Grading()),
      "q187_flow_trans" -> (() => q187FlowT()),
    )

    val out = new StringBuilder
    val names = if (args.length > 1) args.drop(1).toSeq else frames.keys.toSeq.sorted
    names.foreach { n =>
      out ++= s"===== $n =====\n"
      out ++= frames(n)().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      out ++= "\n"
    }
    if (args.nonEmpty)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), out.toString)
    else println(out.toString)
    spark.stop()
  }
}
