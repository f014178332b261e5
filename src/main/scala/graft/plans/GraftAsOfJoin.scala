package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** Native as-of join — the whole-operator Catalyst exercise (custom
  * LogicalPlan + SparkStrategy + SparkPlan, SURVEY §2 extension): for
  * every left row, attach the LATEST right row with the same key and
  * right.ts ≤ left.ts, as ONE sort-merge pass.
  *
  * Why a custom physical operator when the composed union+window form
  * (graft.ops.AsOf) already has the right asymptotics: the composed
  * form must funnel BOTH sides through one union → one exchange of
  * |L|+|R| rows on the key, then window-sort the union, then filter the
  * right rows back out. The native exec shuffles each side
  * independently (same total rows moved), sorts each side separately
  * (two smaller sorts instead of one big one), never materializes the
  * union, and streams the merge with O(1) state per partition — one
  * held right row. Semantics are identical (AsOfSpec cross-checks all
  * edge cases against the composed form), including the determinism
  * contract: right-side (key, ts) ties resolve to the
  * struct-lexicographic max payload, enforced here by the required
  * child ordering rather than a window tie-break.
  *
  * The reference has no join machinery at all (SURVEY §2.3 — J1 is an
  * API-call enrichment); this operator belongs to the engine's
  * driver-mandated general operator suite.
  */
case class GraftAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    tolerance: Option[Long],
    broadcastHint: Option[Boolean] = None,
    rightUnique: Boolean = false) extends BinaryNode {

  // the execs build key/ts orderings from the LEFT side's types and
  // apply them to right-side rows — a type mismatch (e.g. LONG vs INT
  // ts) would compare garbage bytes and produce silently wrong
  // matches, so it must fail at construction, not at execution
  require(org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(
      leftKey.dataType, rightKey.dataType),
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(org.apache.spark.sql.catalyst.types.DataTypeUtils.sameType(
      leftTs.dataType, rightTs.dataType),
    s"as-of ts types differ: ${leftTs.dataType} vs ${rightTs.dataType}")

  // LEFT OUTER semantics: every left row survives; unmatched right
  // columns are null, so the right output is re-declared nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // The operator genuinely READS every right column unless the caller
  // asserts (key, ts) uniqueness: equal-(key, ts) ties resolve by
  // lexicographic max over the right payload, so a pruned payload
  // column could flip which tied row wins for the columns that remain.
  // Declaring the references makes Catalyst's GENERIC column pruning
  // (which walks node.references for unknown operators) honor the tie
  // contract instead of silently narrowing the right child; under
  // rightUnique it may prune freely, as does AsOfPushdownRule.
  override def references: AttributeSet =
    super.references ++
      (if (rightUnique) AttributeSet.empty else AttributeSet(right.output))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[GraftAsOfJoin]] as [[AsOfJoinExec]]. Injected either via
  * spark.experimental.extraStrategies (programmatic, what
  * NativeAsOf.asOfJoin does) or spark.sql.extensions →
  * [[graft.functions.GraftExtensions]] (config-wired). */
object GraftAsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: GraftAsOfJoin =>
      // the same size-statistics decision Spark's JoinSelection makes:
      // a dimension-sized right history broadcasts, so the (100 TB)
      // left side is probed map-only — no exchange, no sort
      val doBroadcast = j.broadcastHint.getOrElse {
        val thr = SQLConf.get.autoBroadcastJoinThreshold
        thr > 0 && j.right.stats.sizeInBytes <= thr
      }
      if (doBroadcast) {
        BroadcastAsOfJoinExec(j.leftKey, j.rightKey, j.leftTs, j.rightTs,
          j.tolerance, j.rightUnique, planLater(j.left), planLater(j.right)) :: Nil
      } else {
        AsOfJoinExec(j.leftKey, j.rightKey, j.leftTs, j.rightTs, j.tolerance,
          j.rightUnique, planLater(j.left), planLater(j.right)) :: Nil
      }
    case _ => Nil
  }
}

/** Sort-merge as-of join. Both children are hash-clustered on the key
  * (EnsureRequirements co-partitions them, exactly as it does for
  * SortMergeJoinExec) and sorted by (key, ts); the right side is
  * additionally sorted by its payload columns so equal-(key, ts) right
  * rows have a deterministic winner (the last = lexicographic max —
  * the same contract as the composed form's window tie-break).
  *
  * Per partition the merge holds exactly ONE buffered right row (the
  * latest at-or-before the current left probe): state is O(1), the
  * pass is O(|L| + |R|), and there is no quadratic blowup on long
  * right histories — the failure mode of the range-join+argmax
  * formulation this operator exists to avoid.
  *
  * NULL keys follow SQL/DuckDB ASOF semantics: a left row with a null
  * key is emitted null-extended, a right row with a null key matches
  * nothing. `rightUnique` (a caller assertion that right (key, ts) is
  * unique) drops the payload columns from the required right ordering —
  * the tie contract is vacuous, so ties need no deterministic winner
  * and the sort keys stay narrow.
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    tolerance: Option[Long],
    rightUnique: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      (if (rightUnique) Nil
       else right.output
        .filterNot(a => a.semanticEquals(rightKey) || a.semanticEquals(rightTs))
        .map(SortOrder(_, Ascending))))

  // the merge preserves the left side's partitioning and sort order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyE = leftKey
    val rKeyE = rightKey
    val lTsE = leftTs
    val rTsE = rightTs
    val out = output
    val tol = tolerance

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        // single-field comparisons via natural row orderings — works
        // for any orderable key/ts type without per-type branching
        private val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKeyE.dataType))
        private val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsE.dataType))
        private val lKeyProj = UnsafeProjection.create(Seq(lKeyE), lOut)
        private val lTsProj = UnsafeProjection.create(Seq(lTsE), lOut)
        private val rKeyProj = UnsafeProjection.create(Seq(rKeyE), rOut)
        private val rTsProj = UnsafeProjection.create(Seq(rTsE), rOut)
        // bind against nullable-forced right attributes: the unmatched
        // all-null row must project as nulls, not as zero-valued reads
        private val outProj =
          UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rOut.length)

        // lookahead right row (projections copied — buffers are reused)
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTs: InternalRow = _
        // the held match: latest right row with ts ≤ current left probe
        private var held: InternalRow = _
        private var heldKey: InternalRow = _
        private var heldTs: InternalRow = _
        advanceRight()

        // skips null-key AND null-ts right rows: NULL keys never
        // match (SQL ASOF semantics), and a NULL right ts sorts FIRST
        // under the required ordering, so without this skip it would
        // compare ≤ every probe and become a bogus match (NULL ≤ x is
        // not true in SQL; the composed AsOf form never matches it) —
        // worse, with a tolerance the null slot reads as 0 and
        // survives the staleness mask. Left null-key rows then fall
        // out naturally — nulls sort first, so no right row compares
        // ≤ them and the row emits null-extended.
        private def advanceRight(): Unit = {
          rRow = null; rKey = null; rTs = null
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val t = rTsProj(r)
            if (!k.isNullAt(0) && !t.isNullAt(0)) {
              rRow = r
              rKey = k.copy()
              rTs = t.copy()
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = lTsProj(l)
          // a NULL left ts matches nothing (right.ts ≤ NULL is never
          // true) — guard explicitly, or a held match from an earlier
          // same-key probe would leak onto this row
          val lTsNull = lTs.isNullAt(0)
          // a held match never outlives its key group
          if (held != null && keyOrd.compare(heldKey, lKey) != 0) {
            held = null; heldKey = null; heldTs = null
          }
          // consume right rows up to (key, ts); the LAST one consumed
          // wins — with the payload in the child ordering that is the
          // deterministic lexicographic max among (key, ts) ties
          var continue = rRow != null
          while (continue) {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0) {
              advanceRight()
              continue = rRow != null
            } else if (kc == 0 && tsOrd.compare(rTs, lTs) <= 0) {
              held = rRow.copy(); heldKey = rKey; heldTs = rTs
              advanceRight()
              continue = rRow != null
            } else {
              continue = false
            }
          }
          val matched =
            if (held == null || lTsNull) nullRight
            // tolerance masking: a match staler than `tol` units is
            // nulled, row kept. Long and Timestamp[NTZ] ts types both
            // store as physical long (micros for timestamps — so tol
            // is in µs there); enforced at the API
            else if (tol.isDefined && lTs.getLong(0) - heldTs.getLong(0) > tol.get) nullRight
            else held
          outProj(joined(l, matched))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join — the dimension-history fast path. The right
  * side arrives as a broadcast (EnsureRequirements inserts the
  * BroadcastExchange, exactly as for BroadcastNestedLoopJoinExec);
  * each task builds a per-key ts-sorted array index from it and probes
  * with a hash lookup + binary search per left row.
  *
  * Why it exists: the sort-merge [[AsOfJoinExec]] must hash-exchange
  * AND sort the LEFT side. When left is the 100 TB fact stream and
  * right is a dimension history (prices, rates, slowly-changing
  * attributes), that exchange dominates the query — this operator is
  * map-only over the left child: it preserves the left partitioning
  * and ordering, moves zero left bytes, and costs O(|R| log |R|)
  * index build per task (dimension-sized by the strategy's stats
  * gate) plus O(log h) per probe.
  *
  * Tie semantics match [[AsOfJoinExec]]: the group arrays sort by
  * (ts, payload…), and the probe takes the LAST entry with ts ≤
  * probe-ts — the lexicographic-max payload among equal timestamps
  * (payload dropped from the sort under `rightUnique`, where ties
  * cannot exist by caller assertion). NULL keys never match (SQL ASOF
  * semantics): null-key right rows are excluded from the index,
  * null-key left rows emit null-extended.
  *
  * The per-key index is built ONCE PER EXECUTOR (not per task):
  * [[BroadcastAsOfJoinExec.cachedIndex]] memoizes on the identity of
  * the broadcast value — the same sharing discipline as Spark's
  * HashedRelation broadcast mode, done on the consumer side because
  * IdentityBroadcastMode ships raw rows. Weak keys: cache entries die
  * with the broadcast block, so no memory outlives the query.
  */
case class BroadcastAsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    tolerance: Option[Long],
    rightUnique: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // map-only over the left child: its partitioning and order survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val bRight = right.executeBroadcast[Array[InternalRow]]()
    val lOut = left.output
    val rOut = right.output
    val lKeyE = leftKey
    val rKeyE = rightKey
    val lTsE = leftTs
    val rTsE = rightTs
    val out = output
    val tol = tolerance

    // operator shape disambiguates two as-of execs consuming the same
    // broadcast with different key/ts expressions
    val shape = s"$rKeyE|$rTsE|$rightUnique"

    left.execute().mapPartitions { lIter =>
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsE.dataType))
      val index = BroadcastAsOfJoinExec.cachedIndex(bRight.value, shape) {
        val rKeyProj = UnsafeProjection.create(Seq(rKeyE), rOut)
        val rTsProj = UnsafeProjection.create(Seq(rTsE), rOut)
        // (ts, payload…) ordering — same determinism contract as the
        // sort-merge exec's required right-child ordering
        val rowOrd = RowOrdering.create(
          SortOrder(rTsE, Ascending) +:
            (if (rightUnique) Nil
             else rOut.filterNot(a => a.semanticEquals(rKeyE) || a.semanticEquals(rTsE))
              .map(SortOrder(_, Ascending))),
          rOut)

        // build: key -> rows sorted by (ts, payload), ts projected out
        // for the binary search (any orderable ts type)
        val grouped = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[InternalRow]]
        bRight.value.foreach { r =>
          val k = rKeyProj(r)
          // null keys and null timestamps never match — keep them out
          // of the index (a null ts sorts first and binary search
          // would select it for EVERY probe, including null-ts probes)
          if (!k.isNullAt(0) && !rTsProj(r).isNullAt(0)) {
            var buf = grouped.get(k)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
              grouped.put(k.copy(), buf) // copy only when storing
            }
            buf += r // broadcast rows are already materialized copies
          }
        }
        val built = new java.util.HashMap[UnsafeRow, (Array[InternalRow], Array[InternalRow])]
        grouped.forEach { (k, buf) =>
          val rows = buf.toArray
          java.util.Arrays.sort(rows, rowOrd)
          built.put(k, (rows.map(r => rTsProj(r).copy(): InternalRow), rows))
        }
        built
      }

      val lKeyProj = UnsafeProjection.create(Seq(lKeyE), lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsE), lOut)
      val outProj =
        UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      lIter.map { l =>
        var matched: InternalRow = nullRight
        val lKey = lKeyProj(l)
        val entry = if (lKey.isNullAt(0)) null else index.get(lKey)
        if (entry != null) {
          val (tsArr, rows) = entry
          val lTs = lTsProj(l)
          // last index with ts <= probe ts; array order makes that the
          // lexicographic-max payload among equal-timestamp ties
          var lo = 0
          var hi = tsArr.length - 1
          var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (tsOrd.compare(tsArr(mid), lTs) <= 0) { ans = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          if (ans >= 0 &&
              (tol.isEmpty || lTs.getLong(0) - tsArr(ans).getLong(0) <= tol.get)) {
            matched = rows(ans)
          }
        }
        outProj(joined(l, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  private type Index =
    java.util.HashMap[UnsafeRow, (Array[InternalRow], Array[InternalRow])]

  /** Per-entry memo cell: the global cache lock only INSTALLS holders
    * (O(1) map ops); the O(|R| log |R|) index build runs under the
    * holder's own lazy-val lock, so two tasks building indexes for
    * DIFFERENT (broadcast, shape) keys proceed concurrently while
    * tasks sharing a key still build exactly once. */
  private final class Holder(build: () => Index) {
    lazy val value: Index = {
      val idx = build()
      indexBuilds.incrementAndGet()
      idx
    }
  }

  /** Executor-wide per-key-index cache, keyed by broadcast-value
    * identity (outer, weak — entries die with the broadcast block)
    * and operator shape (inner — two execs may consume one broadcast
    * with different key/ts expressions). */
  private val cache =
    new java.util.WeakHashMap[AnyRef, java.util.HashMap[String, Holder]]

  /** Observable build count — lets tests pin "index built once per
    * executor, not once per task" without reaching into the cache. */
  private[graft] val indexBuilds = new java.util.concurrent.atomic.AtomicLong(0L)

  private[plans] def cachedIndex(bval: AnyRef, shape: String)(build: => Index): Index = {
    val holder = cache.synchronized {
      var inner = cache.get(bval)
      if (inner == null) {
        inner = new java.util.HashMap[String, Holder]
        cache.put(bval, inner)
      }
      var h = inner.get(shape)
      if (h == null) {
        h = new Holder(() => build)
        inner.put(shape, h)
      }
      h
    }
    holder.value
  }
}
