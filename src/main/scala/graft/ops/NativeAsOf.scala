package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.Tables._
import graft.plans.{AsOfPushdownRule, GraftAsOfJoin, GraftAsOfJoinStrategy}

/** DataFrame surface of the native as-of join ([[graft.plans.GraftAsOfJoin]]):
  * same API and semantics as the composed [[AsOf.asOfJoin]], planned as
  * the custom sort-merge [[graft.plans.AsOfJoinExec]] instead of a
  * union+window. AsOfSpec cross-checks every edge case between the two
  * forms; q61 hash-verifies the native plan against the same DuckDB
  * ASOF JOIN oracle as the composed q51. */
object NativeAsOf {

  /** Native as-of join. Contract matches [[AsOf.asOfJoin]]: `left` and
    * `right` share exactly the `key` and `ts` column names, payload
    * column sets are disjoint, ties on ts match (ASOF `>=`), multiple
    * right rows at one (key, ts) resolve to the lexicographic max
    * payload deterministically, and NULL keys never match (SQL ASOF
    * semantics — null-key left rows come back null-extended). The
    * matched right timestamp comes back as `matched_<ts>`. `tolerance`
    * requires a LongType, TimestampType, or TimestampNTZType ts
    * (timestamps of either flavor measure the tolerance in
    * MICROSECONDS — their shared physical representation).
    *
    * `broadcast`: None lets the strategy decide from right-side size
    * statistics (same gate as Spark's own JoinSelection —
    * autoBroadcastJoinThreshold); Some(true)/Some(false) forces the
    * map-only broadcast probe / the co-partitioned sort-merge.
    *
    * `rightUnique`: caller assertion that right (key, ts) pairs are
    * unique. The tie contract is then vacuous, so the execs drop the
    * payload columns from the tie-break ordering AND the optimizer may
    * prune unreferenced right columns through the join (narrower right
    * scan — see AsOfPushdownRule). Asserting it falsely makes ties
    * nondeterministic; it is an assertion, not a checked invariant. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String,
               tolerance: Option[Long] = None,
               broadcast: Option[Boolean] = None,
               rightUnique: Boolean = false): DataFrame = {
    val rPayload = right.columns.filterNot(c => c == key || c == ts).toSeq
    val lPayload = left.columns.filterNot(c => c == key || c == ts).toSeq
    require(lPayload.intersect(rPayload).isEmpty,
      s"payload columns must be disjoint: ${lPayload.intersect(rPayload)}")
    require(!left.columns.contains(s"matched_$ts"),
      s"left must not already have a matched_$ts column")
    require(!right.columns.contains("_graft_rk") && !right.columns.contains(s"matched_$ts"),
      s"right column names _graft_rk and matched_$ts are reserved by asOfJoin")
    tolerance.foreach { _ =>
      val t = left.schema(ts).dataType
      // Timestamp and TimestampNTZ both store physical long MICROS, so
      // AsOfJoinExec's tolerance subtraction (GraftAsOfJoin.scala) is
      // type-agnostic across all three; tolerance is in µs for both
      // timestamp flavors
      require(t == LongType || t == TimestampType || t == TimestampNTZType,
        s"tolerance requires a Long, Timestamp, or TimestampNTZ $ts column, got $t")
    }

    val spark = left.sparkSession
    PlanBridge.ensureStrategy(spark, GraftAsOfJoinStrategy)
    PlanBridge.ensureOptimization(spark, AsOfPushdownRule)

    // alias EVERY right column: fresh exprIds make the node self-join
    // safe (q61 builds both sides from the same events scan), the ts
    // rename gives the output contract, and the key gets an internal
    // name that is dropped after the join
    val r2 = right.select(
      (col(key).as("_graft_rk") +: col(ts).as(s"matched_$ts") +:
        rPayload.map(c => col(c).as(c))): _*)

    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(r2)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))

    PlanBridge.ofRows(spark, GraftAsOfJoin(
        lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, "_graft_rk"),
        attr(lPlan, ts), attr(rPlan, s"matched_$ts"),
        tolerance, broadcast, rightUnique))
      .drop("_graft_rk")
  }

  /** The q51 events query through the native operator: for each
    * purchase, the user's latest click at or before it. */
  private def asofEvents(s: SparkSession, d: String,
                         broadcast: Option[Boolean]): DataFrame = {
    val ev = events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("value")).as("click_value"))
    asOfJoin(purchases, clicks, "user_id", "ts_us", broadcast = broadcast)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
              col("matched_ts_us").as("click_ts_us"), col("click_value"))
      .orderBy(col("event_id"))
  }

  /** q61: the sort-merge native plan. Same DuckDB ASOF JOIN oracle as
    * the composed q51; the two queries must hash-match each other. */
  def q61AsofNative(s: SparkSession, d: String): DataFrame =
    asofEvents(s, d, broadcast = Some(false))

  /** q62: the same query forced onto the broadcast probe — map-only
    * over the purchase side (no exchange, no sort on the fact stream);
    * hash-verified against the same ASOF oracle. */
  def q62AsofBroadcast(s: SparkSession, d: String): DataFrame =
    asofEvents(s, d, broadcast = Some(true))

  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q61_asof_native", q61AsofNative _, Some(AsOf.q51Sql)),
    ("q62_asof_broadcast", q62AsofBroadcast _, Some(AsOf.q51Sql)),
  )
}
