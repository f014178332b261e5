package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quality
import graft.functions.NativeExprs

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")))
  }

  // ------------------------------------------------------------- q109

  test("chunkDedup: identical doc duplicates every chunk of the later copy") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ") // 40 tokens → 3 chunks @16
    val d = docs((1L, "a", text), (2L, "a", text))
    val got = Quality.chunkDedup(d, 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (3L, 0L), "first occurrence carries no dups")
    assert(got(2L) == (3L, 3L), "every chunk of the later copy is a dup")
  }

  test("chunkDedup: aligned shared chunk is caught, short doc is one chunk") {
    val shared = (1 to 16).map(i => s"s$i").mkString(" ")
    val d = docs(
      (1L, "a", shared + " " + (1 to 16).map(i => s"x$i").mkString(" ")),
      (2L, "a", shared + " " + (1 to 16).map(i => s"y$i").mkString(" ")),
      (3L, "a", "tiny doc"))
    val got = Quality.chunkDedup(d, 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(2L) == (2L, 1L), "doc 2's first chunk equals doc 1's first chunk")
    assert(got(3L) == (1L, 0L), "sub-chunk doc is exactly one chunk, no dups")
  }

  test("chunkDedup: within-doc repetition dedups against the doc's own earlier chunk") {
    val c = (1 to 16).map(i => s"r$i").mkString(" ")
    val got = Quality.chunkDedup(docs((7L, "a", c + " " + c)), 16).collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((2L, 1L)))
  }

  // ------------------------------------------------------------- q110

  test("quantileNorm: percent_rank calibrates per source; bottom quintile dropped") {
    // source a: 5 docs with strictly increasing type-token ratio
    val d = docs(
      (1L, "a", "x x x x x"),         // ttr 0.2  → pct 0.00 → drop
      (2L, "a", "x x x x y"),         // ttr 0.4  → pct 0.25
      (3L, "a", "x x x y z"),         // ttr 0.6
      (4L, "a", "x x w y z"),         // ttr 0.8
      (5L, "a", "v x w y z"),         // ttr 1.0  → pct 1.00
      (6L, "b", "q q"))               // lone doc in b: pct 0 → drop
    val got = Quality.quantileNorm(d, 0.2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getInt(4))).toMap
    assert(got(1L) == (0.0, 0))
    assert(got(2L) == (0.25, 1))
    assert(got(5L) == (1.0, 1))
    assert(got(6L) == (0.0, 0), "singleton source ranks at 0 and is dropped")
  }

  // ------------------------------------------------------------- q111

  test("winsorize: clipping pulls the outlier mean toward the body") {
    import spark.implicits._
    // 19 docs of length ~100 and one 100000-char monster
    val d = (1 to 19).map(i => (i.toLong, "a", 100L + i)) :+ ((20L, "a", 100000L))
    val df = d.toDF("doc_id", "source", "n_chars")
    val row = Quality.winsorize(df).collect().head
    val meanRaw = row.getAs[Double]("mean_raw")
    val meanW = row.getAs[Double]("mean_winsor")
    assert(meanRaw > 5000, "raw mean is dominated by the outlier")
    assert(meanW < 1000, s"winsorized mean ($meanW) shakes off the outlier")
    assert(row.getAs[Double]("p95") < 100000, "p95 sits below the outlier")
  }

  // ------------------------------------------------------------- q112

  test("klDivergence: zero when every source equals the mixture, positive under skew") {
    // a and b have IDENTICAL token distributions → the corpus mixture
    // equals each of them → KL = 0 for both.
    val same = Quality.klDivergence(docs(
      (1L, "a", "x y x y"), (2L, "b", "x y x y"))).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(same == Map("a" -> 0.0, "b" -> 0.0))
    // c concentrated on z, a skewed toward x → both diverge from the mix;
    // c's divergence is exactly log2(1/q(z)) = log2(2) = 1 bit.
    val skew = Quality.klDivergence(docs(
      (1L, "a", "x x x y"), (3L, "c", "z z z z"))).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(skew("c") == 1.0, s"point mass on a half-mixture token is 1 bit (got $skew)")
    assert(skew("a") > 0.0 && skew.values.forall(_ >= 0.0), "KL non-negative, skew positive")
  }

  test("klDivergence: uniform corpus of one source is exactly zero") {
    val got = Quality.klDivergence(docs((1L, "solo", "a b c a b c"))).collect()
    assert(got.map(_.getDouble(2)).toSeq == Seq(0.0))
  }

  // ------------------------------------------------------------- q113

  test("deflateLen expression: deterministic and equal to a reference Deflater") {
    import spark.implicits._
    val texts = Seq("hello world hello world", "a", (1 to 500).mkString(" "))
    val got = texts.toDF("t").select(NativeExprs.deflateLen(col("t")))
      .collect().map(_.getInt(0)).toSeq
    val want = texts.map { s =>
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    assert(got == want)
    val again = texts.toDF("t").select(NativeExprs.deflateLen(col("t")))
      .collect().map(_.getInt(0)).toSeq
    assert(again == want, "deflate length is run-to-run deterministic")
  }

  test("compressRatio: repetitive source compresses below the diverse source") {
    val rep = Array.fill(200)("boilerplate").mkString(" ")
    val div = (1 to 200).map(i => s"w${i * 7919 % 9973}x$i").mkString(" ")
    val d = docs((1L, "rep", rep), (2L, "div", div))
    val got = Quality.compressRatio(d, 0.3).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("mean_ratio"),
        r.getAs[Long]("n_flagged"))).toMap
    assert(got("rep")._1 < got("div")._1, "repetition compresses harder")
    assert(got("rep")._2 == 1L, "repetitive doc is flagged below 0.3")
    assert(got.values.forall(_._1 > 0.0), "ratio is strictly positive")
  }

  // ------------------------------------------------------------- q114

  test("ksDrift: identical distributions score 0, disjoint distributions score 1") {
    import spark.implicits._
    // a and b share the same length histogram; c sits on a disjoint range
    val rows =
      (1 to 10).map(i => (i.toLong, "a", (i % 5) * 10L + 100L)) ++
      (11 to 20).map(i => (i.toLong, "b", (i % 5) * 10L + 100L)) ++
      (21 to 30).map(i => (i.toLong, "c", 10000L + i))
    val df = rows.toDF("doc_id", "source", "n_chars")
    val got = Quality.ksDrift(df).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("c") == 1.0, "disjoint support maximizes KS")
    // a vs rest(b ∪ c): F_a matches b on half the rest mass → D = c's share
    assert(got("a") == 0.5 && got("b") == 0.5,
      s"a/b drift only by c's presence in the rest (got $got)")
    assert(got.values.forall(v => v >= 0.0 && v <= 1.0), "KS ∈ [0,1]")
  }

  // ------------------------------------------------------------- q117

  test("bootstrapCi: thresholds are a valid CDF and weights average ~1") {
    import spark.implicits._
    // Poisson(1) weights over 20k (doc, replica) draws: mean ≈ 1
    val d = (1L to 200L).map(i => (i, "a", 100L)).toDF("doc_id", "source", "n_chars")
    val ci = Quality.bootstrapCi(d, 100).collect().head
    // constant metric → every replica mean is exactly 100 → degenerate CI
    assert(ci.getAs[Double]("ci_lo") == 100.0 && ci.getAs[Double]("ci_hi") == 100.0,
      "constant column bootstrap collapses to the constant")
    assert(ci.getAs[Double]("mean_obs") == 100.0)
  }

  test("bootstrapCi: CI brackets the observed mean and has positive width on real spread") {
    import spark.implicits._
    val d = (1L to 300L).map(i => (i, if (i % 2 == 0) "a" else "b", (i * 37 % 1000) + 50))
      .toDF("doc_id", "source", "n_chars")
    Quality.bootstrapCi(d, 100).collect().foreach { r =>
      val (lo, m, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("mean_obs"),
        r.getAs[Double]("ci_hi"))
      assert(lo < hi, s"${r.getString(0)}: CI must have positive width ($lo, $hi)")
      assert(lo <= m && m <= hi,
        s"${r.getString(0)}: percentile-bootstrap CI [$lo, $hi] should bracket mean $m")
      // CLT sanity: 150 samples of a ~±475 spread → CI half-width well under 200
      assert(hi - lo < 200, s"CI implausibly wide: [$lo, $hi]")
    }
  }

  // ------------------------------------------------------------- q119

  test("mad: immune to the outlier that wrecks stddev") {
    import spark.implicits._
    val d = ((1 to 19).map(i => (i.toLong, "a", 100L + (i % 5))) :+ ((20L, "a", 1000000L)))
      .toDF("doc_id", "source", "n_chars")
    val r = Quality.mad(d).collect().head
    assert(r.getAs[Double]("mad") <= 2.0, "MAD stays at the body's scale")
    assert(r.getAs[Double]("stddev") > 10000, "stddev is destroyed by one outlier")
    assert(math.abs(r.getAs[Double]("robust_sigma") -
      r.getAs[Double]("mad") * 1.4826) < 1e-3)
  }

  // ------------------------------------------------------------- q120

  test("lengthTokenCorr: perfect linear relation gives corr 1, anti-relation -1") {
    import spark.implicits._
    // y (token count) is len/2 exactly when text is 'x '*k: n_chars = 2k-1
    val pos = (1 to 20).map { i =>
      val text = Seq.fill(i + 1)("x").mkString(" ")
      (i.toLong, "pos", text, text.length.toLong)
    }
    // anti: n_chars DECREASES as token count increases
    val neg = (1 to 20).map { i =>
      val text = Seq.fill(i + 1)("y").mkString(" ")
      (100L + i, "neg", text, 1000L - text.length)
    }
    val df = (pos ++ neg).toDF("doc_id", "source", "text", "n_chars")
    val got = Quality.lengthTokenCorr(df).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("corr_len_tok")).toMap
    assert(got("pos") == 1.0, s"exact linear → corr 1 (got ${got("pos")})")
    assert(got("neg") == -1.0, s"exact anti-linear → corr -1 (got ${got("neg")})")
  }

  // ------------------------------------------------------------- q121

  test("lengthHistogram: counts partition the corpus, extremes land in end buckets") {
    import spark.implicits._
    val d = ((1 to 50).map(i => (i.toLong, "a", 100L + i)) ++
      (51 to 90).map(i => (i.toLong, "b", 500L + i)))
      .toDF("doc_id", "source", "n_chars")
    val got = Quality.lengthHistogram(d, 16).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum == 90, "every doc lands in a bucket")
    val buckets = got.map(_.getAs[Int]("bucket"))
    assert(buckets.forall(b => b >= 0 && b <= 15))
    val aMax = got.filter(_.getString(0) == "a").map(_.getAs[Int]("bucket")).max
    val bMin = got.filter(_.getString(0) == "b").map(_.getAs[Int]("bucket")).min
    assert(aMax < bMin, "disjoint length ranges occupy disjoint bucket ranges")
    assert(got.exists(r => r.getAs[Int]("bucket") == 0), "global min is in bucket 0")
    assert(got.exists(r => r.getAs[Int]("bucket") == 15), "global max is in bucket 15")
  }

  test("ksDrift: single-source frame scores a defined 0, not NaN") {
    import spark.implicits._
    val got = Quality.ksDrift((1 to 5).map(i => (i.toLong, "only", i * 10L))
        .toDF("doc_id", "source", "n_chars")).collect()
    assert(got.map(_.getDouble(2)).toSeq == Seq(0.0), "empty rest → D = 0 by definition")
  }

  test("lengthTokenCorr: zero-variance and singleton sources yield NULL, not NaN") {
    val d = docs(
      (1L, "const", "x y"), (2L, "const", "a b"),   // identical lengths+counts
      (3L, "solo", "p q r"))                        // single row
    val got = Quality.lengthTokenCorr(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("const").isNullAt(2), "zero variance → corr NULL (matches DuckDB)")
    assert(got("solo").isNullAt(4) && got("solo").isNullAt(5),
      "singleton → sample stddev NULL (matches DuckDB)")
  }

  test("compressRatio: empty docs are reported in n_empty, not mixed into the stats") {
    val d = docs((1L, "a", ""), (2L, "a", "w1 w2 w3 w4 w5 w6 w7 w8"))
    val r = Quality.compressRatio(d, 0.3).collect().head
    assert(r.getAs[Long]("n_scored") == 1L, "only the scored doc counts")
    assert(r.getAs[Long]("n_empty") == 1L)
    assert(!r.isNullAt(r.fieldIndex("mean_ratio")), "stats come from the scored doc")
  }

  // ------------------------------------------------------------- q127/q128/q129

  test("pmiBigrams: perfectly-bound pair scores exactly log2(4) = 2 bits") {
    // 50 docs of "x y": p(xy)=1, p(x)=p(y)=1/2 → PMI = log2(1/(1/4)) = 2
    val d = docs((1 to 50).map(i => (i.toLong, "a", "x y")): _*)
    val got = graft.ops.Text.pmiBigrams(d, 25).collect()
    assert(got.length == 1)
    assert((got.head.getString(0), got.head.getString(1)) == ("x", "y"))
    assert(got.head.getAs[Double]("pmi") == 2.0)
  }

  test("charClassProfile: hand-computed class fractions") {
    val d = docs((1L, "a", "ab 12 !")) // alpha 2, digit 2, space 2, other 1, n 7
    val r = Quality.charClassProfile(d).collect().head
    assert(r.getAs[Double]("alpha_frac") == (2.0 / 7 * 1e6).round / 1e6)
    assert(r.getAs[Double]("digit_frac") == (2.0 / 7 * 1e6).round / 1e6)
    assert(r.getAs[Double]("space_frac") == (2.0 / 7 * 1e6).round / 1e6)
    assert(r.getAs[Double]("other_frac") == (1.0 / 7 * 1e6).round / 1e6)
  }

  test("dupGroupSpectrum: planted 3x/2x/1x groups give the exact waste spectrum") {
    val d = docs(
      (1L, "a", "triple copy"), (2L, "a", "triple copy"), (3L, "a", "triple copy"),
      (4L, "a", "double copy"), (5L, "a", "double copy"),
      (6L, "a", "unique doc"))
    val got = graft.ops.Dedup.dupGroupSpectrum(d).collect()
      .map(r => r.getAs[Long]("group_size") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("wasted_docs"),
         r.getAs[Double]("waste_share"))).toMap
    assert(got(1L) == (1L, 0L, 0.0))
    assert(got(2L) == (1L, 1L, (1.0 / 3 * 1e6).round / 1e6))
    assert(got(3L) == (1L, 2L, (2.0 / 3 * 1e6).round / 1e6))
  }

  test("dupGroupSpectrum: all-unique corpus has zero waste, no NaN share") {
    val d = docs((1L, "a", "one"), (2L, "a", "two"))
    val got = graft.ops.Dedup.dupGroupSpectrum(d).collect()
    assert(got.length == 1 && got.head.getAs[Double]("waste_share") == 0.0)
  }

  test("ksDrift: two identical sources are exactly zero") {
    import spark.implicits._
    val rows = (1 to 10).map(i => (i.toLong, "a", (i % 10) * 7L)) ++
      (11 to 20).map(i => (i.toLong, "b", (i % 10) * 7L))
    val got = Quality.ksDrift(rows.toDF("doc_id", "source", "n_chars"))
      .collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(0.0, 0.0))
  }

  // ------------------------------------------------------------- q151

  test("langMix: monolingual source scores entropy 0; uniform 2-lang scores 1 bit") {
    import spark.implicits._
    val d = Seq(
      (1L, "mono", "en", "x"), (2L, "mono", "en", "x"),
      (3L, "duo", "en", "x"), (4L, "duo", "de", "x"),
      (5L, "skewed", "en", "x"), (6L, "skewed", "en", "x"),
      (7L, "skewed", "en", "x"), (8L, "skewed", "de", "x"))
      .toDF("doc_id", "source", "lang", "text")
    val got = Quality.langMix(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("mono").getAs[Double]("lang_entropy_bits") == 0.0)
    assert(got("mono").getAs[Double]("dom_share") == 1.0)
    assert(got("duo").getAs[Double]("lang_entropy_bits") == 1.0)
    assert(got("duo").getAs[Double]("dom_share") == 0.5)
    val h = got("skewed").getAs[Double]("lang_entropy_bits")
    assert(h > 0.0 && h < 1.0, s"3:1 mix sits strictly between: $h")
    assert(got("skewed").getAs[Long]("n_langs") == 2L)
  }

  // ------------------------------------------------------------- q183

  private def fpsOf(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(Quality.cdcChunkFps(col("text")).as("fps"))
      .collect().head.getSeq[String](0)
  }

  test("cdc chunking: boundary count and reassembly invariants") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def isBoundary(tok: String): Boolean = {
      md.reset()
      val h = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      h.startsWith(Quality.CdcBoundaryHex)
    }
    val toks = (1 to 300).map(i => s"tok$i")
    val expected = toks.count(isBoundary) + (if (isBoundary(toks.last)) 0 else 1)
    val fps = fpsOf(toks.mkString(" "))
    assert(fps.length == expected,
      s"one chunk per boundary token (+1 for an unterminated tail): $expected")
    assert(fps.forall(_.length == 32), "md5 fingerprints")
  }

  test("cdc chunking keeps empty tokens (spacing edges) exactly like the oracle's slices") {
    // straight-line Scala mirror of the q183 ORACLE definition:
    // positional ends, chunks as space-joins of the raw slices
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): String = {
      md.reset(); md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def oracle(text: String): Seq[String] = {
      val t = text.split(" ", -1).toSeq
      val ends = t.indices.filter(i =>
        h(t(i)).startsWith(Quality.CdcBoundaryHex) || i == t.length - 1)
      ends.zipWithIndex.map { case (e, j) =>
        val from = if (j == 0) 0 else ends(j - 1) + 1
        h(t.slice(from, e + 1).mkString(" "))
      }
    }
    // find a boundary token so the edges interact with a real cut
    val b = (1 to 500).map(i => s"tok$i")
      .find(t => h(t).startsWith(Quality.CdcBoundaryHex)).get
    for (text <- Seq(
        s"$b ",              // trailing space: empty tail chunk
        s" $b",              // leading space: empty-led first chunk
        s"$b  x y",          // empty token right after a boundary
        s"a  b $b  c ",      // doubles + trailing, mid-document
        "   "))              // only empties
      assert(fpsOf(text) == oracle(text),
        s"spark and oracle chunking must agree on <$text>")
  }

  test("cdc chunking realigns after a prepended token; fixed chunking does not") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def isBoundary(tok: String): Boolean =
      md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .startsWith(Quality.CdcBoundaryHex)
    val toks = (1 to 400).map(i => s"word$i")
    val inserted = (1 to 50).find(i => !isBoundary(s"ins$i")).map(i => s"ins$i").get
    val base = toks.mkString(" ")
    val edited = inserted + " " + base
    val a = fpsOf(base); val b = fpsOf(edited)
    // CDC: the insertion only grows the FIRST chunk — every boundary
    // after it is a token property and re-aligns, so exactly one of
    // the original fingerprints is lost.
    assert(a.toSet.intersect(b.toSet).size == a.length - 1,
      "all chunks but the edited first one must survive the edit")
    // fixed 16-token chunking: the same edit shifts every boundary
    def fixedFps(ts: Seq[String]): Set[String] = {
      val dig = java.security.MessageDigest.getInstance("MD5")
      ts.grouped(16).map(g =>
        dig.digest(g.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .toSet
    }
    val shiftShared = fixedFps(toks).intersect(fixedFps(inserted +: toks)).size
    assert(shiftShared <= 1,
      s"fixed-offset chunking must lose (nearly) all matches after a 1-token shift, shared $shiftShared")
  }

  test("q183: per-source digest is sane and dup-heavier than unique text would be") {
    val rows = Quality.q183CdcDedup(spark, TestSpark.sf0001).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chunks"); val u = r.getAs[Long]("n_uniq_chunks")
      assert(u >= 1 && u <= n)
      val ratio = r.getAs[Double]("dup_ratio")
      assert(math.abs(ratio - (1.0 - u.toDouble / n)) < 1e-3)
    }
    // the near-dup-heavy corpus repeats chunks somewhere
    assert(rows.map(r => r.getAs[Long]("n_chunks") - r.getAs[Long]("n_uniq_chunks")).sum > 0,
      "planted near-dups must share CDC chunks")
  }
}
