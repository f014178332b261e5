package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Near-duplicate detection over documents (SURVEY §2.9): MinHash+LSH,
  * SimHash, and exact n-gram Jaccard (the verification oracle for the
  * sketch-based paths).
  *
  * Scale design: the sketches (64-slot MinHash signature, 64-bit
  * SimHash) are fixed-size per document regardless of text length, so
  * the shuffle for candidate generation moves O(n · bands · 8 bytes) —
  * never the corpus text and never the O(n²) pair space. Candidate
  * pairs come from bucket-colliding band self-joins; exact similarity
  * is recomputed only for candidates.
  *
  * Everything is array/lambda expressions (codegen'd); no UDFs.
  */
object Dedup {

  val SigLen = 64       // MinHash signature slots
  val Bands = 4         // LSH bands (16 rows each): P(collide) = j^16 —
                        // a sharp high-similarity filter, so degenerate
                        // corpora (this one: median token-set j ≈ 0.87)
                        // don't explode the candidate join
  val RowsPerBand: Int = SigLen / Bands
  val MaxBucket = 200   // skip degenerate buckets (standard LSH skew guard)

  /** Distinct token set (unigram shingles) — on this corpus the right
    * granularity for near-dup (docs draw from a shared small vocab). */
  private def tokenSet(c: Column): Column = array_distinct(split(c, " "))

  /** word n-gram shingles (n≥2) via sliding window over the token array. */
  def shingles(c: Column, n: Int): Column =
    // guard: sequence(1, 0) counts DOWN in Spark, so short docs need an
    // explicit empty-array branch, not a clamped upper bound
    expr(s"""CASE WHEN size(split(text, ' ')) < $n THEN array()
            |ELSE transform(sequence(1, size(split(text, ' ')) - ${n - 1}),
            |     i -> concat_ws(' ', slice(split(text, ' '), i, $n))) END""".stripMargin)

  /** MinHash signature: slot j = min over shingles of xxhash64(shingle, j).
    * One pass over the shingle array per slot; all inside codegen. */
  def minhashSig(shingleCol: Column): Column = {
    val slots: Seq[Column] = (0 until SigLen).map { j =>
      array_min(transform(shingleCol, sh => xxhash64(sh, lit(j))))
    }
    array(slots: _*)
  }

  /** Per-doc MinHash signature + banded bucket keys. Always non-empty;
    * the plumbing that a 100 TB dedup job shuffles. */
  def withMinhash(df: DataFrame): DataFrame =
    df.withColumn("sig", minhashSig(tokenSet(col("text"))))
      .withColumn("bands",
        expr(s"transform(sequence(0, ${Bands - 1}), " +
             s"b -> xxhash64(concat_ws(',', slice(sig, b * $RowsPerBand + 1, $RowsPerBand)), b))"))

  /** MinHash-LSH near-duplicate pairs, in the shape that survives 100 TB:
    *  1. fixed-size signatures per doc (shuffle never carries the text);
    *  2. candidate ids from band-bucket self-joins on IDS ONLY, with a
    *     bucket-size cap (degenerate buckets are skew bombs, skip them);
    *  3. distinct candidate pairs BEFORE re-joining the two signatures,
    *     so the signature payload moves once per unique pair, not once
    *     per colliding band.
    * Rows-only check; estimator validated against exact Jaccard in
    * DedupSpec and via q44's oracle. */
  def q43MinhashPairs(s: SparkSession, d: String): DataFrame = {
    val signed = withMinhash(documents(s, d))
      .select(col("doc_id"), col("sig"), col("bands")).cache()
    val ex = signed.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band_idx", "bucket")))
    val small = ex.groupBy(col("band_idx"), col("bucket"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= MaxBucket)
    val inSmall = ex.join(small, Seq("band_idx", "bucket"))
    val cands = inSmall.select(col("band_idx"), col("bucket"), col("doc_id").as("id_a"))
      .join(inSmall.select(col("band_idx"), col("bucket"), col("doc_id").as("id_b")),
            Seq("band_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(signed.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(signed.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(expr("filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)"))
          .cast("double") / SigLen, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.8)
      .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
      .limit(100)
  }

  /** Exact token-set Jaccard for a bounded id range — the ground truth
    * the MinHash estimate converges to; oracle-checkable in DuckDB. */
  def q44JaccardExact(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id"), tokenSet(col("text")).as("ts"))
    val a = docs.select(col("doc_id").as("id_a"), col("ts").as("ts_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("ts").as("ts_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("ts_a"), col("ts_b"))).cast("double")
              / size(array_union(col("ts_a"), col("ts_b"))), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val q44Sql: String =
    """WITH docs AS (
      | SELECT doc_id, list_distinct(str_split(text, ' ')) AS ts
      | FROM documents WHERE doc_id < 60
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      | round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
      |       / len(list_distinct(list_cat(a.ts, b.ts))), 4) AS jaccard
      |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  /** 64-bit SimHash per document from token xxhash64s: bit i is the sign
    * of the +1/−1 vote sum across tokens. Emitted with a 16-bit prefix
    * bucket (the banding key for hamming-neighbor candidate search). */
  def q45Simhash(s: SparkSession, d: String): DataFrame = {
    // tokens hashed ONCE into `th`; the 63 per-bit vote folds then run
    // over precomputed longs (bit math only — no repeated string hashing)
    def votes(i: Int) = s"aggregate(th, 0L, " +
      s"(acc, h) -> acc + CASE WHEN (h >> $i) % 2 != 0 THEN 1 ELSE -1 END)"
    // pack bits 0..62 via sum of powers (bit 63 dropped: keeps the packed
    // value positive in a signed BIGINT; 63 bits is ample for bucketing)
    val sim = (0 until 63).map(i =>
        when(expr(votes(i)) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    documents(s, d)
      .withColumn("th", expr("transform(split(text, ' '), t -> xxhash64(t))"))
      .select(col("doc_id"), sim.as("simhash"))
      .withColumn("bucket16", expr("simhash % 65536"))
      .orderBy(col("doc_id"))
  }

  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q43_minhash_pairs", q43MinhashPairs _, None),
    ("q44_jaccard_exact", q44JaccardExact _, Some(q44Sql)),
    ("q45_simhash", q45Simhash _, None),
  )
}
