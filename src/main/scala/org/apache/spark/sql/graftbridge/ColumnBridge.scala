package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4's Column API is connect-agnostic
  * and the classic accessors (ExpressionUtils) are private[sql], so this
  * lives inside the org.apache.spark.sql namespace — the documented
  * extension seam for engines that define custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Registers a temp SQL function backed by a Catalyst expression
    * builder (functionRegistry is private[sql]; this bridge is the
    * supported seam for session-scoped engine functions). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Uncache by LOGICAL PLAN (CacheManager is private[sql]): lets a
    * bounded-cache slot retain only (session, analyzed plan) instead
    * of the whole Dataset — retaining the Dataset measurably slows
    * every subsequent query in the session (~0.5 s per LSH invocation,
    * round-12 measurement), while a bare LogicalPlan is inert. */
  def uncacheByPlan(spark: org.apache.spark.sql.SparkSession,
                    plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sharedState.cacheManager.uncacheQuery(classic, plan, cascade = false)
  }
}
