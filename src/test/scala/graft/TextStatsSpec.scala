package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** q106 token frequency spectrum + q107 token entropy: hand-computed
  * planted frames, invariants over the synthetic corpus, and the
  * zero-shuffle plan claim for the entropy pass. */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def docs(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("source", "doc_id", "text")
  }

  test("q106: hand-computed spectrum on a planted corpus") {
    // srcA tokens: a a a b b c  -> counts {a:3, b:2, c:1}
    //   vocab 3, hapax 1 (c), dis 1 (b), top 3
    // srcB tokens: x y          -> counts {x:1, y:1}
    //   vocab 2, hapax 2, dis 0, top 1
    val rows = Text.tokenSpectrum(docs(Seq(
        ("srcA", 1L, "a a a b"),
        ("srcA", 2L, "b c"),
        ("srcB", 3L, "x y"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(rows("srcA") == ((3L, 1L, 1L, 1.0 / 3, 3L)) ||
      (rows("srcA")._1 == 3L && rows("srcA")._2 == 1L && rows("srcA")._3 == 1L &&
        math.abs(rows("srcA")._4 - 1.0 / 3) < 1e-5 && rows("srcA")._5 == 3L))
    assert(rows("srcB")._1 == 2L && rows("srcB")._2 == 2L &&
      rows("srcB")._3 == 0L && rows("srcB")._4 == 1.0 && rows("srcB")._5 == 1L)
  }

  test("q106: fp-based counts agree with raw-token counts (collision-free regime)") {
    val d = graft.Tables.documents(spark, sf)
    val byFp = Text.tokenSpectrum(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
      .toMap
    val byTok = d
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("n") === 2, 1L).otherwise(0L)).as("dis"),
        max(col("n")).as("top_freq"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(byFp == byTok,
      "xxhash64 token fingerprints must reproduce the string-keyed spectrum exactly")
  }

  test("q107: hand-computed entropies") {
    val rows = Text.tokenEntropy(docs(Seq(
        ("s", 1L, "a a a a"),          // all same token -> H = 0
        ("s", 2L, "a b c d"),          // uniform over 4 -> H = 2
        ("s", 3L, "a a b b"),          // uniform over 2 -> H = 1
        ("s", 4L, "a a b"))))          // H = log2(3) - (2*1)/3
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(1L) == 0.0)
    assert(rows(2L) == 2.0)
    assert(rows(3L) == 1.0)
    val h4 = math.log(3.0) / math.log(2.0) - 2.0 / 3.0
    assert(math.abs(rows(4L) - h4) < 1e-6)
  }

  test("q107: entropy bounds hold over the corpus (0 <= H <= log2(distinct))") {
    val rows = Text.q107TokenEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(3)
      val maxH = math.log(r.getLong(2).toDouble) / math.log(2.0)
      assert(h >= -1e-9, s"doc ${r.getLong(0)}: entropy $h < 0")
      assert(h <= maxH + 1e-6,
        s"doc ${r.getLong(0)}: entropy $h > log2(distinct) = $maxH")
    }
  }

  test("q107: the entropy pass is map-only (no Exchange below the sort)") {
    val plan = Text.tokenEntropy(graft.Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"tokenEntropy must not shuffle:\n$plan")
  }

  test("q123 heaps law: templated source flattens, novel source keeps growing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // templated: every doc repeats the same 5 tokens → vocab flat after decile 1
    val templated = (1 to 20).map(i => (i.toLong, "tmpl", "a b c d e"))
    // novel: every doc contributes fresh tokens → every decile adds vocab
    val novel = (1 to 20).map(i => (100L + i, "nov", (1 to 5).map(j => s"t${i}_$j").mkString(" ")))
    val got = graft.ops.Text.heapsLaw((templated ++ novel).toDF("doc_id", "source", "text"))
      .collect()
    val tmpl = got.filter(_.getString(0) == "tmpl")
    assert(tmpl.map(_.getAs[Long]("vocab_cum")).max == 5, "templated vocab caps at 5")
    assert(tmpl.length == 1 && tmpl.head.getAs[Long]("decile") == 1,
      "no new tokens past the first decile")
    val nov = got.filter(_.getString(0) == "nov").sortBy(_.getAs[Long]("decile"))
    assert(nov.length == 10, "novel source adds vocabulary in every decile")
    assert(nov.map(_.getAs[Long]("new_tokens")).forall(_ == 10),
      "2 docs x 5 fresh tokens per decile")
    val cums = nov.map(_.getAs[Long]("vocab_cum"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a }, "strictly growing")
    assert(cums.last == 100, "final vocab = all distinct tokens")
  }

  // ------------------------------------------------------------- q157

  /** Reference in-memory BPE trainer with the SAME pair-count and
    * greedy-leftmost-merge semantics as the distributed one. Ties
    * compare UTF-8 BYTES (Spark's binary collation) — Java's natural
    * String order is UTF-16 code units, which disagrees for
    * supplementary-plane symbols. */
  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var r = 0
    while (r == 0 && i < x.length && i < y.length) {
      r = (x(i) & 0xFF) - (y(i) & 0xFF); i += 1
    }
    if (r != 0) r else x.length - y.length
  }

  private def refBpe(words: Map[String, Long], n: Int,
                     endOfWord: Boolean = false): Seq[(Int, String, String, Long)] = {
    def applyM(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    var vocab = words.toSeq.map { case (w, c) =>
      val syms = w.map(_.toString).toVector
      (if (endOfWord) syms :+ graft.ops.Text.BpeEow else syms, c)
    }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 1
    while (r <= n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.iterator.sliding(2).withPartial(false).foreach { p =>
          counts((p(0), p(1))) += c
        }
      }
      if (counts.isEmpty) return out.toSeq
      val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }(
        Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))
      out += ((r, a, b, cnt))
      vocab = vocab.map { case (syms, c) => (applyM(syms, a, b), c) }
      r += 1
    }
    out.toSeq
  }

  test("q157 bpe: distributed trainer equals the reference on a planted corpus") {
    import spark.implicits._
    // hand-checkable plant: 'ab' dominates, then 'abc' builds on it
    val docs = Seq(
      (1L, "abc abc abc ab"), (2L, "abc ab xy"), (3L, "ab xy xy"))
      .toDF("doc_id", "text")
    val got = graft.ops.Text.bpeTrain(docs, 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val words = Map("abc" -> 4L, "ab" -> 3L, "xy" -> 3L)
    val want = refBpe(words, 4).map { case (r, a, b, c) => (r, a, b, c) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    // first merge is (a, b) with count 7 (4 'abc' + 3 'ab'), second
    // builds hierarchically: ('ab', c) with count 4
    assert(got(0) == ((1, "a", "b", 7L)))
    assert(got(1) == ((2, "ab", "c", 4L)))
  }

  test("bpeTrainFromVocab ignores correction residue (wc <= 0, empty words)") {
    import spark.implicits._
    // an over-retracted streaming ledger legitimately holds negative
    // counters (LedgerStreamSpec's randomized trial produces them) and
    // may carry empty-word rows; fed raw into the merge loop a
    // negative wc would silently SUBTRACT from pair statistics
    val clean = Seq(("abc", 4L), ("ab", 3L), ("xy", 3L)).toDF("w", "wc")
    val dirty = clean.union(
      Seq(("abq", -5L), ("xy", 0L), ("", 7L)).toDF("w", "wc"))
    val want = graft.ops.Text.bpeTrainFromVocab(clean, 4)
      .collect().map(_.toSeq).toSeq
    val got = graft.ops.Text.bpeTrainFromVocab(dirty, 4)
      .collect().map(_.toSeq).toSeq
    assert(got == want,
      "residue rows must not perturb the learned merge table")
  }

  test("bpe end-of-word marker: learns a word-final suffix invisible without it") {
    import spark.implicits._
    // four distinct words all ending in 's', no other repeated pair:
    // with the marker, (s, </w>) weight 8 dominates; without it,
    // word-final 's' is indistinguishable from any other symbol
    val docs = Seq((1L, "cats dogs runs hogs"), (2L, "cats dogs runs hogs"))
      .toDF("doc_id", "text")
    val withM = graft.ops.Text.bpeTrain(docs, 3, endOfWord = true).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(withM.head == ((1, "s", graft.ops.Text.BpeEow, 8L)),
      s"word-final s must be the top merge: ${withM.toSeq}")
    // and the whole table equals the marker-aware reference
    val words = Map("cats" -> 2L, "dogs" -> 2L, "runs" -> 2L, "hogs" -> 2L)
    assert(withM.toSeq == refBpe(words, 3, endOfWord = true))
    // without the marker the top merge is 'gs'/'og'-class (weight 4) —
    // word-final structure is invisible
    val without = graft.ops.Text.bpeTrain(docs, 1).collect()
    assert(without.head.getLong(4) == 4L)
  }

  test("q157/q177 oracle recipe: wrapped-separator replace ≡ greedy-leftmost fold") {
    // The oracle SQL applies each merge via leftmost non-overlapping
    // string replace over a chr(31)-WRAPPED symbol encoding (each
    // symbol is `␟sym␟`, concatenated; pattern `␟l␟␟r␟` → `␟lr␟`).
    // Java's String.replace(CharSequence, CharSequence) is the same
    // leftmost non-overlapping semantics as DuckDB's and Spark's
    // replace, so the identity is testable here without DuckDB. The
    // round-16 single-separator encoding FAILED this for back-to-back
    // pair occurrences (abab/aaaa/banana — the round-17 HIGH advice):
    // the first match consumed the separator the second needed.
    val S = "\u001F"
    def enc(syms: Seq[String]): String = syms.map(s => S + s + S).mkString
    def dec(s: String): Vector[String] =
      s.split(S).iterator.filter(_.nonEmpty).toVector
    def replaceMerge(s: String, l: String, r: String): String =
      s.replace(S + l + S + S + r + S, S + l + r + S)
    def foldMerge(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    // the advice's planted adversarial words, plus hierarchy cases
    val cases = Seq(
      ("abab", ("a", "b")), ("aaaa", ("a", "a")), ("aaaaa", ("a", "a")),
      ("banana", ("a", "n")), ("haha", ("h", "a")), ("coco", ("c", "o")),
      ("abcabc", ("a", "b")), ("xyxyxy", ("x", "y")), ("zzz", ("z", "z")))
    cases.foreach { case (w, (a, b)) =>
      val viaSql = dec(replaceMerge(enc(w.map(_.toString)), a, b))
      val viaFold = foldMerge(w.map(_.toString).toVector, a, b)
      assert(viaSql == viaFold,
        s"'$w' under ($a,$b): replace gave $viaSql, fold gave $viaFold")
    }
    // multi-round hierarchy: merged symbols must keep the invariant
    // (each symbol owns its separator pair) across later rounds
    val merges = Seq(("a", "b"), ("ab", "ab"), ("abab", "c"))
    val word = "ababcababc".map(_.toString).toVector
    val (sqlEnd, foldEnd) = merges.foldLeft((enc(word), word)) {
      case ((s, v), (l, r)) => (replaceMerge(s, l, r), foldMerge(v, l, r))
    }
    assert(dec(sqlEnd) == foldEnd, s"hierarchical: ${dec(sqlEnd)} vs $foldEnd")
    // randomized sweep over a tiny alphabet (maximizes back-to-back
    // repeats) — deterministic seed, every (word, merge) pair agrees
    val rnd = new scala.util.Random(157177)
    (1 to 500).foreach { _ =>
      val w = Vector.fill(1 + rnd.nextInt(10))(('a' + rnd.nextInt(2)).toChar.toString)
      val (l, r) = (('a' + rnd.nextInt(2)).toChar.toString, ('a' + rnd.nextInt(2)).toChar.toString)
      assert(dec(replaceMerge(enc(w), l, r)) == foldMerge(w, l, r),
        s"random: word=$w merge=($l,$r)")
    }
    // and the shipped SQL actually uses the wrapped recipe — guards a
    // silent regression to the single-separator encoding
    val pat = "chr(31)||l||chr(31)||chr(31)||r||chr(31)"
    val v0 = "chr(31)||chr(31)) || chr(31)"
    Seq(graft.ops.Text.q157Sql, graft.ops.Text.q177Sql).foreach { sql =>
      assert(sql.contains(pat), "merge pattern must be separator-wrapped")
      assert(sql.contains(v0), "v0/e0 encoding must wrap each symbol")
      assert(!sql.contains("chr(31)||l||chr(31)||r||chr(31)"),
        "single-separator merge pattern must not reappear")
    }
  }

  test("q157 bpe: equals the reference on the real sf0.001 corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = graft.ops.Text.bpeTrain(docs, graft.ops.Text.BpeMerges).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val words = docs.selectExpr("explode(split(text, ' ')) AS w")
      .where("length(w) > 0")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(words, graft.ops.Text.BpeMerges)
    assert(got.length == graft.ops.Text.BpeMerges)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // merged column is the concatenation, ranks are 1..n
    val rows = graft.ops.Text.bpeTrain(docs, 3).collect()
    rows.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("q177 bpe encode: per-source stats equal a driver reference encoder") {
    def applyM(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val n = graft.ops.Text.BpeMerges
    val merges = graft.ops.Text.bpeTrain(docs, n).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val words = docs
      .selectExpr("source", "explode(split(text, ' ')) AS w")
      .where("length(w) > 0")
      .groupBy("source", "w").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def encLen(w: String): Long =
      merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (a, b)) => applyM(s, a, b)
      }.length.toLong
    val want = words.groupBy(_._1).map { case (src, ws) =>
      val nWords = ws.map(_._3).sum
      val toks = ws.map { case (_, w, c) => c * encLen(w) }.sum
      val chars = ws.map { case (_, w, c) => c * w.length }.sum
      (src, nWords, toks,
        BigDecimal(chars.toDouble / toks).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.ops.Text.q177BpeEncode(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == want.toSet, s"got ${got.toSeq}\nwant $want")
    // more merges can never increase the token count (each merge only
    // ever fuses adjacent symbols)
    val fewer = graft.ops.Text.bpeEncodeStats(docs, 2).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    got.foreach { case (src, _, toks, _) =>
      assert(toks <= fewer(src),
        s"$src: $n merges gave $toks tokens, 2 merges gave ${fewer(src)}")
    }
  }

  test("q180 novelty: a paste-up of earlier docs scores low, originals and novel docs score 1") {
    // docs 1 and 2 are fully novel; doc 3 is a PASTE-UP restating both
    // (no single near-dup pair — the case pairwise dedup misses); doc
    // 4 is novel again; doc 5 is too short to carry a 5-gram
    val d = docs(Seq(
      ("a", 1L, "alpha beta gamma delta epsilon zeta"),
      ("a", 2L, "one two three four five six"),
      ("a", 3L, "alpha beta gamma delta epsilon one two three four five"),
      ("a", 4L, "red orange yellow green blue indigo"),
      ("a", 5L, "too short")))
    val rows = graft.ops.Text.noveltyAudit(d).collect()
    assert(rows.length == 1)
    val r = rows.head
    // doc 5 carries no shingle → 4 scored docs
    assert(r.getAs[Long]("n_docs") == 4L, s"short doc must be excluded: $r")
    // doc 3's 6 distinct shingles: 'alpha..epsilon' (first in doc 1),
    // 'one..five' (first in doc 2), and 4 bridging shingles that are
    // genuinely new → novelty 4/6; docs 1, 2, 4 are fully novel
    val want = BigDecimal((1.0 + 1.0 + 4.0 / 6.0 + 1.0) / 4)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("mean_novelty") == want,
      s"mean novelty: got ${r.getAs[Double]("mean_novelty")}, want $want")
    assert(r.getAs[Long]("n_mostly_dup") == 0L)
    // shrink doc 3 to ONLY restated content → it becomes mostly-dup
    val d2 = docs(Seq(
      ("a", 1L, "alpha beta gamma delta epsilon zeta"),
      ("a", 3L, "alpha beta gamma delta epsilon zeta")))
    val r2 = graft.ops.Text.noveltyAudit(d2).collect().head
    assert(r2.getAs[Long]("n_mostly_dup") == 1L,
      s"an exact restatement must count as mostly-dup: $r2")
  }

  // ------------------------------------------------------------- q154

  test("q154 bm25: positive non-increasing scores, <=3 terms hit, saturation beats raw tf") {
    val rows = graft.ops.Text.q154Bm25(spark, TestSpark.sf0001).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0.0), "idf uses the +1-inside-log form, never negative")
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "top-k must be score-sorted")
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_terms_hit")
      assert(hit >= 1 && hit <= 3)
    }
    // tf saturation: with k1 = 1.2 a single term's contribution is
    // bounded by idf·(k1+1) — the whole 3-term score by 3·idf_max·2.2.
    // idf_max ≤ ln(1 + (N+0.5)/1.5) ≈ ln(N); sanity-bound the scores.
    val n = Tables.documents(spark, TestSpark.sf0001).count().toDouble
    val bound = 3.0 * math.log(1.0 + (n + 0.5) / 1.5) * 2.2
    assert(scores.head <= bound, s"score ${scores.head} exceeds saturation bound $bound")
  }

  // ------------------------------------------------------------- q182

  test("q182: salted two-level top-k equals the naive single-window ranking") {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, TestSpark.sf0001)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
    val naive = tf.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n").desc, col("token").asc)))
      .filter(col("rk") <= Text.ZipfTopK)
      .select("lang", "token", "n", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val salted = Text.zipfTopTerms(tf)
      .select("lang", "token", "n", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(salted == naive,
      "the salted pre-prune must be lossless: identical (lang, token, n, rank) sets")
  }

  test("q182: zipf fit emits one row per language with a negative head slope") {
    val rows = Text.q182ZipfFit(spark, TestSpark.sf0001).collect()
    val langs = rows.map(_.getString(0))
    assert(langs.sameElements(langs.sorted) && langs.distinct.length == langs.length)
    rows.foreach { r =>
      assert(r.getAs[Double]("zipf_slope") < 0.0,
        s"${r.getString(0)}: rank-frequency slope must be negative")
      val r2 = r.getAs[Double]("zipf_r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(r.getAs[Long]("n_terms") <= r.getAs[Long]("total_tokens"))
    }
  }

  test("q182: a planted power-law corpus recovers its exponent") {
    import spark.implicits._
    // term i appears round(1000 / i) times → ln n = ln 1000 − 1·ln rank:
    // the fit over exact integer counts must land near slope −1.
    val docs = (1 to 50).flatMap { i =>
      val reps = math.max(1, math.round(1000.0 / i).toInt)
      Seq.fill(reps)(f"w$i%03d")
    }.grouped(97).zipWithIndex
      .map { case (toks, id) => (id.toLong, "zz", toks.mkString(" ")) }
      .toSeq.toDF("doc_id", "lang", "text")
    val row = Text.zipfFit(docs).collect().head
    val slope = row.getAs[Double]("zipf_slope")
    assert(slope > -1.1 && slope < -0.9, s"expected ≈ −1, got $slope")
    assert(row.getAs[Double]("zipf_r2") > 0.98,
      "an exact power law must fit nearly perfectly")
  }

  test("q193: hand-computed fertility on a planted bilingual corpus") {
    import spark.implicits._
    // en docs: "the the"  -> ws 2, bpe [the,the] 2,        chars 6
    //          "the cat!" -> ws 2, bpe [the,cat,!] 3,      chars 7
    //   fertility 5/4 = 1.25, chars/token 13/5 = 2.6
    // es doc: "de la de la" -> ws 4, bpe 4, chars 8 -> 1.0, 2.0
    // (profile scores: en grams th+he dominate doc 1-2; es grams de+la doc 3)
    val rows = Text.langFertility(Seq(
        "the the", "the cat!", "de la de la").zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rows.keySet == Set("en", "es"))
    assert(rows("en") == ((2L, 4L, 5L, 1.25, 2.6)))
    assert(rows("es") == ((1L, 4L, 4L, 1.0, 2.0)))
  }

  test("q193: fertility groups partition the corpus; labels agree with q35") {
    val d = graft.Tables.documents(spark, sf)
    val fert = Text.langFertility(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fert.values.sum == d.count(), "groups must partition the corpus")
    val q35 = graft.ops.Text.q35LangId(spark, sf).groupBy(col("predicted_lang"))
      .agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fert == q35, "q193's labels must be exactly q35's classifier")
  }

  test("q194: hand-computed calibration bins with planted duplicates") {
    import spark.implicits._
    // bin 0 (score 0): two UNIQUE docs           -> dup_rate 0
    // bin 5 (score .5): two unique docs          -> dup_rate 0
    // bin 9 (score 1, clamped from floor(10)): two COPIES -> dup_rate 1
    val rows = Text.qualityCalibration(Seq(
        (1L, "cat dog"), (2L, "fish bird"),
        (3L, "the cat"), (4L, "the dog"),
        (5L, "the the the the"), (6L, "the the the the")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set(0L, 5L, 9L))
    assert(rows(0L) == ((2L, 0L, 0.0, 0.0)))
    assert(rows(5L) == ((2L, 0L, 0.0, 0.5)))
    assert(rows(9L) == ((2L, 2L, 1.0, 1.0)),
      "a full-stopword duplicated pair must land clamped in bin 9 with dup_rate 1")
  }

  test("q194: randomized corpus equals a driver brute force") {
    import spark.implicits._
    val stop = Set("the", "of", "and", "a", "to", "in")
    val pool = stop.toSeq ++ Seq("cat", "dog", "fish", "bird", "tree")
    val rnd = new java.util.Random(194L)
    for (round <- 1 to 3) {
      // random docs of 1-8 pool tokens; ~1/3 of docs duplicated verbatim
      val base = (1 to 40).map { _ =>
        (1 to 1 + rnd.nextInt(8)).map(_ => pool(rnd.nextInt(pool.size)))
          .mkString(" ") }
      val texts = base ++ base.filter(_ => rnd.nextInt(3) == 0)
      val expected = {
        val copies = texts.groupBy(identity).view.mapValues(_.size).toMap
        texts.map { t =>
          val ws = t.split(" ", -1)
          val score = ws.count(stop).toDouble / ws.length
          (math.min(math.floor(score * 10).toLong, 9L), score, copies(t) > 1)
        }.groupBy(_._1).map { case (bin, ds) =>
          def r6(x: Double) = BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val dups = ds.count(_._3).toLong
          bin -> ((ds.size.toLong, dups, r6(dups.toDouble / ds.size),
            r6(ds.map(_._2).sum / ds.size)))
        }
      }
      val got = graft.ops.Text.qualityCalibration(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      assert(got.keySet == expected.keySet, s"round $round bins")
      got.foreach { case (bin, (n, d, rate, avg)) =>
        val (en, ed, erate, eavg) = expected(bin)
        assert(n == en && d == ed, s"round $round bin $bin counts")
        assert(math.abs(rate - erate) < 1e-9, s"round $round bin $bin dup_rate")
        // avg over doubles: summation order may differ at the last ulp,
        // which can flip the 6th-decimal rounding — allow one ulp there
        assert(math.abs(avg - eavg) <= 1e-6 + 1e-12, s"round $round bin $bin avg")
      }
    }
  }

  test("q194: bins partition the corpus; dup mass matches the exact-dedup count") {
    val d = graft.Tables.documents(spark, sf)
    val bins = Text.q194QualityCalibration(spark, sf).collect()
    assert(bins.map(_.getLong(1)).sum == d.count(), "bins must partition the corpus")
    // independent ground truth: docs whose exact text occurs more than once
    val dupDocs = d.groupBy(col("text")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L))) // a dup-free corpus sums to 0, not null
      .collect().head.getLong(0)
    assert(bins.map(_.getLong(2)).sum == dupDocs,
      "per-bin dup counts must sum to the corpus's duplicated-doc mass")
  }
}
