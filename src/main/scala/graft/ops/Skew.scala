package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (the 100 TB problem AQE's
  * skew-join split solves at runtime; this is the explicit pre-salt
  * variant for when a key's fan-in exceeds even a split task, or AQE
  * is unavailable — e.g. a streaming micro-batch join).
  *
  * Left rows get a deterministic content-derived salt in [0, salt);
  * the (smaller) right side is replicated across all salt values; the
  * join key becomes (key, salt), spreading each hot key over `salt`
  * reducers. Row multiplicity is preserved exactly — SkewSpec asserts
  * bag equality with the plain join.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salt)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
