package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMinAgg
import graft.ops.Text

/** Count–Min sketch aggregate (q104): exact-regime equality,
  * overestimate-only direction, the εN bound under forced collisions,
  * and bit-identical partition independence (mergeable summaries). */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def tokens(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("source", "token")
  }

  // planted stream: known counts, two sources
  private val planted = tokens(
    Seq.fill(7)(("a", "the")) ++ Seq.fill(3)(("a", "cat")) ++
      Seq.fill(1)(("a", "sat")) ++ Seq.fill(5)(("b", "the")))

  test("exact regime: width far above distinct count gives exact answers") {
    val rows = Text.cmsProbe(planted, Seq("the", "cat", "sat", "missing"),
        depth = 4, width = 1024)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows(("a", "the")) == 7L)
    assert(rows(("a", "cat")) == 3L)
    assert(rows(("a", "sat")) == 1L)
    assert(rows(("a", "missing")) == 0L)
    assert(rows(("b", "the")) == 5L)
    assert(rows(("b", "cat")) == 0L)
  }

  test("estimates never undercount, and stay within N even at a tiny width") {
    // width 4 forces collisions; CMS must overestimate only, and the
    // min-over-rows estimate can never exceed the stream length
    val n = 11L // source a's stream length
    val rows = Text.cmsProbe(planted.filter(col("source") === "a"),
        Seq("the", "cat", "sat", "missing"), depth = 4, width = 4)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = Map("the" -> 7L, "cat" -> 3L, "sat" -> 1L, "missing" -> 0L)
    exact.foreach { case (t, e) =>
      assert(rows(t) >= e, s"$t: est ${rows(t)} < exact $e — CMS must never undercount")
      assert(rows(t) <= n, s"$t: est ${rows(t)} > stream length $n")
    }
  }

  test("partition independence: any repartitioning yields the bit-identical sketch") {
    val d = graft.Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    def sketch(parts: Int) = d.repartition(parts)
      .groupBy(col("source"))
      .agg(CountMinAgg.countMinSketch(col("token"), 4, 256).as("cms"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val one = sketch(1)
    val many = sketch(7)
    assert(one.keySet == many.keySet)
    one.foreach { case (src, sk) =>
      assert(sk == many(src), s"sketch for $src differs across partitionings")
    }
  }

  test("sketches are additive: sketch(A) + sketch(B) = sketch(A ++ B)") {
    val a = planted.filter(col("source") === "a")
    val full = planted.withColumn("source", lit("all"))
    def sk(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(lit(1)).agg(CountMinAgg.countMinSketch(col("token"), 2, 64).as("cms"))
      .collect()(0).getSeq[Long](1)
    val sa = sk(a)
    val sb = sk(planted.filter(col("source") === "b"))
    val sAll = sk(full)
    assert(sa.zip(sb).map { case (x, y) => x + y } == sAll)
  }

  test("persisted-sketch rollup: stored per-group sketches re-merge to the direct sketch") {
    // the q173 pattern for frequencies: the aggregate's OUTPUT already
    // IS the register array, so a persisted per-(group) sketch table
    // rolls up with plain elementwise addition — posexplode + sum here,
    // bit-identical to the single-pass sketch over the union
    val perSource = planted
      .groupBy(col("source"))
      .agg(CountMinAgg.countMinSketch(col("token"), 2, 64).as("cms"))
    val remerged = perSource
      .select(posexplode(col("cms")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(sum(col("v")).as("v"))
      .orderBy(col("pos")).collect().map(_.getLong(1)).toSeq
    val direct = planted
      .groupBy(lit(1)).agg(CountMinAgg.countMinSketch(col("token"), 2, 64).as("cms"))
      .collect()(0).getSeq[Long](1)
    assert(remerged == direct,
      "stored CMS rows must re-aggregate to the register-identical global sketch")
  }

  test("probing with a mismatched layout FAILS with a named error, never a silent null") {
    // a register array that is not depth*width longs is always a
    // build/probe wiring bug; the old guard nulled, which read as
    // "key absent" (round-14 verdict ask #7)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sk = Seq("a", "b", "a").toDF("token")
      .agg(CountMinAgg.countMinSketch(col("token"), 4, 64).as("cms"))
    val e = intercept[Exception] {
      sk.select(CountMinAgg.cmsEstimate(col("cms"), lit("a"), 2, 64)).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("layout mismatch"), s"got: ${rootMsg(e)}")
    // the matched layout still answers
    val ok = sk.select(CountMinAgg.cmsEstimate(col("cms"), lit("a"), 4, 64))
      .collect().head.getLong(0)
    assert(ok >= 2L)
  }

  test("q104 over the corpus: absent probes estimate low, stopwords match exact counts") {
    val rows = Text.q104CmsFreq(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(2), r.getLong(3))
      assert(est >= exact, s"${r.getString(0)}/${r.getString(1)}: est $est < exact $exact")
    }
    // width 1024 across a ~6-source corpus at sf0.001: collisions are
    // possible but the estimate must stay near exact for hot probes
    val absent = rows.filter(_.getString(1).endsWith("_absent"))
    assert(absent.nonEmpty)
    absent.foreach { r =>
      assert(r.getLong(2) == 0L)
    }
  }
}
