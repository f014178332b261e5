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
  * broadcast to tag both sides. Hot probe rows get a deterministic
  * content-derived salt in [0, salt) and the matching build rows are
  * replicated across all salt values, spreading each hot key over
  * `salt` reducers; the cold remainder takes the plain shuffle join
  * untouched and the two halves union. Replicating the WHOLE build
  * side ×salt (the naive shape) multiplies the build shuffle ×salt
  * even when no key is hot — on an unskewed corpus that is pure
  * overhead, and at 100 TB it is the difference between a viable plan
  * and one that moves 16 copies of a fact table. Row multiplicity is
  * preserved exactly — SkewSpec asserts bag equality with the plain
  * join in both the skewed and unskewed regimes.
  */
object Skew {

  /** Default hot-key cutoff: a key under ~100k rows fits any reducer
    * comfortably (a 100-byte row × 100k = 10 MB), so salting it buys
    * nothing; above it, fan-in starts to serialize a task. */
  val DefaultHotThreshold = 100000L

  /** Joins `left` (probe, potentially skewed) with `right` (build) on
    * `key`, salting only the keys in `hotKeys` — every other key joins
    * plain. `hotKeys` must be a one-column frame of key values small
    * enough to broadcast (heavy hitters are few by definition). */
  def saltedJoinWithHotKeys(left: DataFrame, right: DataFrame, key: String,
                            salt: Int, hotKeys: DataFrame): DataFrame = {
    val hotSet = broadcast(
      hotKeys.toDF(key).distinct().withColumn("_hot", lit(true)))
    val lTag = left.join(hotSet, Seq(key), "left")
    val rTag = right.join(hotSet, Seq(key), "left")

    val hotLeft = lTag.filter(col("_hot").isNotNull).drop("_hot")
      .withColumn("_salt",
        pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salt)).cast("int"))
    val hotRight = rTag.filter(col("_hot").isNotNull).drop("_hot")
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    val hotJoined = hotLeft.join(hotRight, Seq(key, "_salt")).drop("_salt")

    val coldJoined = lTag.filter(col("_hot").isNull).drop("_hot")
      .join(rTag.filter(col("_hot").isNull).drop("_hot"), Seq(key))

    hotJoined.unionByName(coldJoined)
  }

  /** Count-based variant: detects the hot-key set from `left` itself.
    * The detection pass is a map-side-combined count over just the key
    * column — at 100 TB it reads one column and shuffles one row per
    * distinct key, a small fraction of the join it protects. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 hotThreshold: Long = DefaultHotThreshold): DataFrame = {
    val hot = left.groupBy(col(key))
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > hotThreshold)
      .select(col(key))
    saltedJoinWithHotKeys(left, right, key, salt, hot)
  }
}
