package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Range (interval) join — the point-in-window complement to the as-of
  * join in [[AsOf]] (SURVEY §2.3 engine extension; the reference has no
  * join machinery beyond J1).
  *
  * Scale shape: the join carries an EQUI prefix (user_id) plus the
  * range residual, so Catalyst plans a shuffled hash / sort-merge join
  * on the key — matches are enumerated only within a key group, never
  * as a cartesian product. This is the shape that survives 100 TB: a
  * pure-inequality join would degrade to BroadcastNestedLoop. Key skew
  * is AQE's problem, as with any equi join. The plan-shape test pins
  * the no-product property.
  */
object RangeJoin {

  private val WindowUs: Long = 30L * 86400 * 1000000 // 30 days in µs

  /** q52: per signup event, purchase count + spend by the same user
    * within 30 days after the signup. Timestamps in integer µs on both
    * engines (the events.parquet NANOS discipline, see Tables.events). */
  def q52RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts_us").as("s_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"), col("value"))
    signups
      .join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("s_ts") && col("p_ts") < col("s_ts") + WindowUs,
        "left")
      .groupBy(col("event_id"), col("user_id"), col("s_ts"))
      .agg(count(col("p_ts")).as("n_purchases"),
           round(sum(col("value")), 2).as("total_spend"))
      .orderBy(col("event_id"))
  }

  val q52Sql: String =
    s"""WITH s AS (
       | SELECT event_id, user_id, epoch_us(ts) AS s_ts
       | FROM events WHERE event_type = 'signup'
       |), p AS (
       | SELECT user_id, epoch_us(ts) AS p_ts, value
       | FROM events WHERE event_type = 'purchase'
       |)
       |SELECT s.event_id, s.user_id, s.s_ts,
       |       count(p.p_ts) AS n_purchases,
       |       round(sum(p.value), 2) AS total_spend
       |FROM s LEFT JOIN p
       |  ON s.user_id = p.user_id
       | AND p.p_ts >= s.s_ts AND p.p_ts < s.s_ts + ${WindowUs}
       |GROUP BY 1, 2, 3
       |ORDER BY s.event_id""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q52_range_join", q52RangeJoin _, Some(q52Sql)),
  )
}
