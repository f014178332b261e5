package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user funnel state (parallel-array product encoding — no Kryo
  * blobs in the state store). Sentinel Long.MaxValue = "no view yet".
  *
  * `clicks`/`purchases` hold only the CANDIDATE timestamps that could
  * still become the funnel answer (see the pruning proof on
  * [[StreamingFunnel]]); both lists are sorted ascending. */
case class FunnelState(tView: Long, clicks: Array[Long], purchases: Array[Long])

/** Streaming CONVERSION FUNNEL — the watermark-free streaming twin of
  * the batch q130 (Relational.q130ConversionFunnel): per user, the
  * dependent stage chain first-view → first-click-at-or-after-that-view
  * → first-purchase-at-or-after-that-click, maintained incrementally
  * with flatMapGroupsWithState and emitted as (user_id, stage) updates.
  *
  * ORDER-INDEPENDENT BY CONSTRUCTION: micro-batch boundaries and
  * arrival order change nothing about the settled answer, because the
  * state is an exact sufficient statistic for the batch computation —
  * no watermark-and-buffer machinery needed:
  *
  *  - t_view = min(view ts) is a plain running min;
  *  - the answer click is a_c = min{c ≥ t_view}. t_view only ever
  *    DECREASES as more views fold in, so a_c only ever decreases —
  *    a click STRICTLY ABOVE the current a_c can never become the
  *    answer and is dropped immediately; every click ≤ a_c (including
  *    clicks below the current t_view, which become eligible if a
  *    later-arriving earlier view lowers it) is retained. While no
  *    view has arrived, every click is a candidate.
  *  - purchases prune identically against a_p = min{p ≥ a_c}.
  *
  * State bound, stated honestly: after a user's first view arrives,
  * the click list is bounded by their clicks BEFORE that view (plus
  * one answer) — at production scale a bot with millions of pre-view
  * clicks is the degenerate case, and the cap belongs in ingest (the
  * same place q43's bucket cap lives), not here. The emitted stage is
  * MONOTONE non-decreasing (folding more events can only lower stage
  * timestamps, never un-reach a stage), so a consumer may keep the
  * max stage per user; FunnelStreamSpec pins stream ≡ batch equality
  * of the resulting stage counts against q130 across multi-file
  * micro-batch schedules.
  */
object StreamingFunnel {

  val NoTs: Long = Long.MaxValue

  /** min{x ∈ xs : x >= floor}, or NoTs. xs sorted ascending. */
  private def answerAtOrAfter(xs: Array[Long], floor: Long): Long = {
    var i = 0
    while (i < xs.length && xs(i) < floor) i += 1
    if (i < xs.length) xs(i) else NoTs
  }

  /** Merge-new-then-prune for one candidate list: keep everything at
    * or below the current answer (candidates for any future, lower
    * floor); drop everything above it (can never win). When no answer
    * exists yet, keep all. */
  private def mergePrune(old: Array[Long], incoming: Seq[Long], floor: Long): Array[Long] = {
    val merged = (old ++ incoming).sorted
    if (floor == NoTs) merged
    else {
      val ans = answerAtOrAfter(merged, floor)
      if (ans == NoTs) merged else merged.takeWhile(_ <= ans)
    }
  }

  /** Numeric stage for one state: 1 = active, 2 = viewed, 3 = clicked
    * at-or-after first view, 4 = purchased at-or-after that click. */
  def stageOf(st: FunnelState): Int = {
    if (st.tView == NoTs) return 1
    val aC = answerAtOrAfter(st.clicks, st.tView)
    if (aC == NoTs) return 2
    if (answerAtOrAfter(st.purchases, aC) == NoTs) 3 else 4
  }

  /** One micro-batch's fold — the pure core of the stateful operator,
    * extracted so FunnelStreamSpec can property-test the pruning
    * claim directly: for ANY partition of a user's events into
    * batches, in ANY order, the folded state's stage equals the
    * all-at-once brute-force stage. */
  private[graft] def fold(st: FunnelState, views: Seq[Long],
                          clicks: Seq[Long], purchases: Seq[Long]): FunnelState = {
    val tView = math.min(st.tView, views.foldLeft(NoTs)(math.min))
    val newClicks = mergePrune(st.clicks, clicks, tView)
    val aC = answerAtOrAfter(newClicks, tView)
    val newPurchases = mergePrune(st.purchases, purchases, aC)
    FunnelState(tView, newClicks, newPurchases)
  }

  /** events must carry (user_id, event_type, ts). Emits the user's
    * current (user_id, stage) after every micro-batch that touched
    * them (Update mode — stages are monotone, take the max). */
  def funnelStages(events: DataFrame): Dataset[(Long, Int)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) =>
          val buf = rows.toSeq
          val st = fold(
            state.getOption.getOrElse(FunnelState(NoTs, Array.empty, Array.empty)),
            buf.collect { case (_, "view", t) => t },
            buf.collect { case (_, "click", t) => t },
            buf.collect { case (_, "purchase", t) => t })
          state.update(st)
          Iterator.single((uid, stageOf(st)))
      }
  }

  /** Settled per-stage funnel counts from the emitted updates (stage
    * monotone ⇒ max per user is the settled stage; a user at stage k
    * has passed every stage ≤ k) — the q130 comparison shape. */
  def stageCounts(updates: DataFrame): DataFrame = {
    val settled = updates.groupBy(col("_1").as("user_id"))
      .agg(max(col("_2")).as("stage"))
    val all = settled.agg(count(lit(1)).as("n_all"))
    val spark = updates.sparkSession
    import spark.implicits._
    // anchor on the STATIC 4-stage frame: batch q130 emits a row per
    // stage even at count 0 (its global aggs over empty frames), and
    // the stream ≡ batch contract must hold on a corpus where a stage
    // was never reached — explode alone drops unreached stages
    val stages = Seq(1, 2, 3, 4).toDF("stage_n")
    stages
      .join(settled
        .select(explode(sequence(lit(1), col("stage"))).as("stage_n"))
        .groupBy(col("stage_n")).agg(count(lit(1)).as("n_reached")),
        Seq("stage_n"), "left_outer")
      .select(col("stage_n"), coalesce(col("n_reached"), lit(0L)).as("n_users"))
      .crossJoin(broadcast(all))
      .select(
        element_at(array(lit("1_all"), lit("2_viewed"), lit("3_clicked"),
          lit("4_purchased")), col("stage_n")).as("stage"),
        col("n_users"),
        round(col("n_users").cast("double") / col("n_all"), 6).as("rate_vs_all"))
      .orderBy(col("stage"))
  }
}
