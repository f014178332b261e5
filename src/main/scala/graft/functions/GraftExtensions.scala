package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-wired registration of the engine's SQL functions:
  *
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * makes every function in NativeExprs.sqlBuilders available in every
  * session of the application without code (the programmatic
  * equivalent is NativeExprs.registerAll(spark)). Both paths iterate
  * the same builder list, so names/validation cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    NativeExprs.sqlBuilders.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        builder))
    }
    // whole-operator extension: plans graft.plans.GraftAsOfJoin nodes
    // (the programmatic twin is PlanBridge.ensureStrategy, which the
    // NativeAsOf.asOfJoin API applies itself)
    e.injectPlannerStrategy(_ => graft.plans.GraftAsOfJoinStrategy)
    // custom nodes are optimization barriers without this: restores
    // filter pushdown + left column pruning through GraftAsOfJoin
    e.injectOptimizerRule(_ => graft.plans.AsOfPushdownRule)
  }
}
