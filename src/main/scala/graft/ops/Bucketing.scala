package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned, pre-sorted) tables: the co-located join
  * path for repeated fact-fact joins at 100 TB — both sides hash-
  * bucketed and sorted on the join key at write time, so the join
  * plans with NO shuffle exchange and no sort (SortMergeJoin reads
  * bucket-aligned, pre-sorted partitions directly).
  *
  * At cluster scale the write cost is paid once; every subsequent join
  * on the bucket key is exchange-free. BucketingSpec asserts the plan
  * shape (zero Exchange operators under the join).
  */
object Bucketing {

  /** Writes df as a bucketed+sorted managed table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Joins two bucketed tables on their bucket key. The MERGE hint pins
    * SortMergeJoin so the bucket layout (not a runtime broadcast) is
    * what eliminates the exchanges — that's the property that holds
    * when both sides are 100 TB. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).hint("MERGE")
      .join(spark.table(right).hint("MERGE"), key)
}
