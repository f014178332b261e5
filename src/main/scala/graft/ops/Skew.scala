package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (the 100 TB problem AQE's
  * skew-join split solves at runtime; this is the explicit pre-salt
  * variant for when a key's fan-in exceeds even a split task, or AQE
  * is unavailable — e.g. a streaming micro-batch join).
  *
  * Salting is applied ONLY to detected hot keys: a map-side-combined
  * groupBy-count over the probe side finds keys whose row count
  * exceeds `hotThreshold` (or the caller supplies the hot-key set
  * directly — e.g. from yesterday's run or a sample); that tiny set is
  * broadcast to tag both sides. The salt is CONDITIONAL inside one
  * join — hot probe rows get a deterministic content-derived salt in
  * [0, salt) and hot build rows explode across all salt values, while
  * cold rows on both sides carry the single salt 0 — so each side is
  * scanned exactly once and the join stays one (key, salt) shuffle.
  * (The two-branch hot/cold-union formulation reads each input twice;
  * replicating the WHOLE build side ×salt unconditionally — the naive
  * shape — moves `salt` copies of a fact table even when no key is
  * hot.) Row multiplicity is preserved exactly — SkewSpec asserts bag
  * equality with the plain join in skewed, unskewed, and mixed
  * regimes.
  */
object Skew {

  /** Default hot-key cutoff: a key under ~100k rows fits any reducer
    * comfortably (a 100-byte row × 100k = 10 MB), so salting it buys
    * nothing; above it, fan-in starts to serialize a task. */
  val DefaultHotThreshold = 100000L

  /** Joins `left` (probe, potentially skewed) with `right` (build) on
    * `key`, salting only the keys in `hotKeys` — every other key joins
    * plain on salt 0. `hotKeys` must be a one-column frame of key
    * values small enough to broadcast (heavy hitters are few by
    * definition). */
  def saltedJoinWithHotKeys(left: DataFrame, right: DataFrame, key: String,
                            salt: Int, hotKeys: DataFrame): DataFrame = {
    // salt = 0 would make the probe side's pmod(..., 0) NULL under
    // non-ANSI SQL and the build side's sequence(0, -1) = [0, -1] —
    // every hot-key row silently vanishes from the inner join on
    // _salt instead of failing here
    require(salt >= 1, s"salt fan-out must be >= 1, got $salt")
    // the helper columns would silently overwrite (then drop) a user
    // column of the same name, breaking the bag-equality contract
    Seq("_hot", "_salt").foreach { h =>
      require(!left.columns.contains(h) && !right.columns.contains(h),
        s"saltedJoin reserves helper column '$h'; rename it on the input")
    }
    val hotSet = broadcast(
      hotKeys.toDF(key).distinct().withColumn("_hot", lit(true)))
    // content-derived salt: deterministic (safe under task retry —
    // the build side carries every salt, so ANY stable assignment
    // joins correctly). Known limit: byte-identical hot rows hash to
    // ONE salt bucket, so a hot key whose rows are all exact
    // duplicates is not split — that corpus shape is an exact-dedup
    // problem (q30) upstream of any join, not a salting problem.
    val salted = left.join(hotSet, Seq(key), "left")
      .withColumn("_salt", when(col("_hot").isNotNull,
          pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salt)).cast("int"))
        .otherwise(lit(0)))
      .drop("_hot")
    val replicated = right.join(hotSet, Seq(key), "left")
      .withColumn("_salt", explode(when(col("_hot").isNotNull,
          sequence(lit(0), lit(salt - 1)))
        .otherwise(array(lit(0)))))
      .drop("_hot")
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Count-based variant: detects the hot-key set from `left` itself.
    * The detection pass is a map-side-combined count over just the key
    * column — at 100 TB it reads one column and shuffles one row per
    * distinct key, a small fraction of the join it protects.
    *
    * CALLER NOTE (r8 ADVICE): the detection pass re-evaluates `left`
    * from scratch, so the one-column-read claim holds only when
    * `left` is a direct columnar scan. A derived/expensive upstream
    * pipeline runs TWICE (detection + join), and a nondeterministic
    * `left` could yield a hot set inconsistent with the join input —
    * still bag-correct (salting any key is semantics-preserving),
    * but unpredictable. Such callers should persist `left` first, or
    * precompute the hot set and use [[saltedJoinWithHotKeys]]. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 hotThreshold: Long = DefaultHotThreshold): DataFrame = {
    val hot = left.groupBy(col(key))
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > hotThreshold)
      .select(col(key))
    saltedJoinWithHotKeys(left, right, key, salt, hot)
  }
}
