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

  /** Writes df as a bucketed+sorted managed table (overwrites).
    *
    * The repartition on the bucket key is load-bearing: bucketBy makes
    * EACH WRITE TASK emit its own file per bucket it holds, and Spark
    * only trusts (and reports) the per-bucket sort order when a bucket
    * is exactly one file — with N input tasks the scan would report
    * unsorted and every "pre-sorted" join would silently re-Sort both
    * 100 TB sides at read time, the exact cost this module claims is
    * paid once at write. repartition(n, col) and bucketBy share the
    * same murmur3 pmod placement, so task i holds exactly bucket i and
    * each bucket lands as one sorted file. (Appends to a bucketed
    * table re-open the multi-file case; appending callers like
    * IncrementalDedup pin merge-join shape with an explicit hint and
    * don't rely on the file-level sort.) */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Joins two bucketed tables on their bucket key. The MERGE hint pins
    * SortMergeJoin so the bucket layout (not a runtime broadcast) is
    * what eliminates the exchanges — that's the property that holds
    * when both sides are 100 TB.
    *
    * Sort elimination additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` in the
    * session (the engine's own mains and the test session set it):
    * since 3.0 Spark reports bucketed scans unsorted by default, and
    * even with the conf on it only trusts the write-time sort when
    * every selected bucket is a single file — which [[writeBucketed]]
    * guarantees and appends deliberately break (their readers must
    * plan a Sort, and do). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).hint("MERGE")
      .join(spark.table(right).hint("MERGE"), key)
}
