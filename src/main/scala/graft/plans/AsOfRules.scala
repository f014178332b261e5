package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules for [[GraftAsOfJoin]]. Catalyst treats an unknown
  * logical node as an optimization barrier: filters and projections
  * above it never reach the scans below, so at 100 TB a
  * `asOfJoin(...).filter(...).select(...)` would read every column of
  * every row of both sides. This rule restores the two pushdowns that
  * matter, with the same semantics guards Catalyst applies to a LEFT
  * OUTER join:
  *
  *  - **Left-predicate pushdown**: a deterministic conjunct whose
  *    references all come from the left child moves below the join —
  *    sound because every left row maps to exactly one output row
  *    (left-outer shape). Right-side predicates must NOT move: they
  *    would drop history rows and change which row is "latest", and
  *    they observe the null-extension.
  *  - **Left column pruning**: output columns never referenced above
  *    the join are projected away on the LEFT child (key/ts always
  *    kept), so the fact-side scan reads only what the query needs.
  *    The right child is pruned ONLY under `rightUnique`: without the
  *    uniqueness assertion, equal-(key, ts) ties resolve by
  *    lexicographic-max over the right payload, so dropping a right
  *    column could change which tied row wins; when the caller
  *    asserts right (key, ts) uniqueness the tie contract is vacuous
  *    and unreferenced right columns prune away like any LEFT OUTER
  *    join's would.
  *
  * Coverage note: pruning fires when a Project is the immediate parent
  * of the join — the shape every `asOfJoin(...).select(...)` call
  * produces. A Project-less parent (e.g. `Aggregate(GraftAsOfJoin)`)
  * keeps the full-width scans; Catalyst's own ColumnPruning would
  * handle those via a generic reference walk, which this rule
  * deliberately does not replicate (narrower, but auditable).
  *
  * Injected through both seams: `GraftExtensions.injectOptimizerRule`
  * (config-wired sessions, runs inside the operator-optimization
  * fixed-point batch) and `PlanBridge.ensureOptimization`
  * (programmatic, what `NativeAsOf.asOfJoin` applies itself).
  */
object AsOfPushdownRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: GraftAsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case p @ Project(fields, j: GraftAsOfJoin)
        if prunableLeft(p.references, j).nonEmpty ||
           prunableRight(p.references, j).nonEmpty =>
      val droppedL = prunableLeft(p.references, j)
      val droppedR = prunableRight(p.references, j)
      // merge into an existing child Project instead of stacking a new
      // one: this rule also runs in the post-operator User Provided
      // batch (programmatic seam) where CollapseProject won't fire
      // again, and a stale inner Project would keep the scan wide
      def pruned(child: LogicalPlan, dropped: AttributeSet): LogicalPlan =
        if (dropped.isEmpty) child
        else child match {
          case Project(inner, grandchild) =>
            Project(inner.filterNot(ne => dropped.contains(ne.toAttribute)), grandchild)
          case other =>
            Project(other.output.filterNot(dropped.contains), other)
        }
      p.copy(child = j.copy(
        left = pruned(j.left, droppedL), right = pruned(j.right, droppedR)))
  }

  /** Left-output attributes not needed by the parent projection nor by
    * the join itself (key/ts are always needed). */
  private def prunableLeft(parentRefs: AttributeSet, j: GraftAsOfJoin): AttributeSet =
    AttributeSet(j.left.output) -- parentRefs -- AttributeSet(Seq(j.leftKey, j.leftTs))

  /** Right-output attributes prunable ONLY under the caller's
    * (key, ts)-uniqueness assertion — otherwise the payload takes part
    * in the deterministic tie-break and must stay. */
  private def prunableRight(parentRefs: AttributeSet, j: GraftAsOfJoin): AttributeSet =
    if (!j.rightUnique) AttributeSet.empty
    else AttributeSet(j.right.output) -- parentRefs --
      AttributeSet(Seq(j.rightKey, j.rightTs))
}
