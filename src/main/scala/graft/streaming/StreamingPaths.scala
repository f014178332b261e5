package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user path state: the ≤2 most recent FINALIZED event types (the
  * trigram bridge across batches), the finalization horizon, the
  * timestamp of the last finalized event (for session-gap resets), and
  * the buffer of events still inside the lateness window — parallel
  * arrays for a flat product encoder.
  *
  * STATE-SCHEMA COMPATIBILITY (round-11 advice): `lastEventTs` was
  * added in round 11 for session-gap severing. Spark's state encoders
  * are positional, so a flatMapGroupsWithState checkpoint written by
  * the earlier 5-field layout will NOT restore against this class —
  * restart such a stream from a fresh checkpoint (the sources replay;
  * Update-mode consumers must dedup re-emitted finalized rows). Any
  * future field change to this class or [[AttrState]] carries the
  * same break. */
case class PathState(lastTypes: Array[String], lastFinalTs: Long,
                     lastEventTs: Long,
                     bufTs: Array[Long], bufId: Array[Long],
                     bufType: Array[String])

/** Streaming EVENT-PATH MINING — the streaming twin of q149's
  * trigram counting, and the suite's demonstration of the
  * WATERMARK-ORDERED REPLAY pattern: unlike the funnel (whose state is
  * an order-independent sufficient statistic), a PATH is inherently
  * order-DEPENDENT — "view>click>purchase" and "click>view>purchase"
  * are different journeys — so out-of-order arrival cannot be absorbed
  * into a clever statistic. The standard answer: buffer events per
  * user while they're inside the watermark's lateness window, and
  * FINALIZE (sort by event time + tie-break, fold, emit) only the
  * prefix the advancing watermark proves complete.
  *
  *  - State per user: the ≤ n−1 last finalized event types (the n-gram
  *    bridge) + the buffered suffix — bounded by rate × lateness
  *    window, NOT stream length.
  *  - An event-time timeout at the earliest buffered timestamp flushes
  *    users the data stopped touching (otherwise a user's tail would
  *    finalize only when they next produce an event).
  *  - Disorder BEYOND the lateness window (an event older than the
  *    finalized horizon) is dropped — same semantics as Spark's own
  *    watermarked aggregates. The operator enforces this itself (the
  *    ingest guard) rather than relying on whether the engine
  *    late-filters flatMapGroupsWithState input (Spark 4 was observed
  *    to; the contract must not depend on it).
  *  - An optional SESSION GAP resets the bridge whenever consecutive
  *    finalized events are further apart than the gap — an n-gram
  *    never spans a silence longer than it (the streaming twin of
  *    q161's sessionized batch paths). The reset happens during
  *    finalization, in event-time order, so a late-but-in-window
  *    arrival that closes a gap is handled exactly like the batch
  *    form would.
  *
  * Emits one (user_id, "a>b>c") row per finalized trigram occurrence
  * (Update mode); a consumer aggregates counts. PathStreamSpec pins
  * stream ≡ batch trigram multisets under controlled disorder within
  * the lateness bound, and stream ≡ sessionized batch with a gap.
  */
object StreamingPaths {

  private val NoTs = Long.MinValue

  /** Finalize everything STRICTLY BELOW `horizonUs` (the watermark
    * proves completeness below itself; an event AT the horizon may
    * still gain same-timestamp, later-event_id peers, so it waits for
    * the watermark to pass it — finalizing inclusively would drop a
    * boundary tie's later member and diverge from the batch
    * tie-break). The new state's lastFinalTs records the HORIZON, not
    * the last event's timestamp — the drop contract is "older than
    * anything proven final", independent of whether an event sat at
    * the boundary. `gapUs` resets the bridge across any silence
    * longer than it. Returns (emitted, newState). */
  private[graft] def finalizeUpTo(st: PathState, horizonUs: Long, n: Int,
                                  gapUs: Long = Long.MaxValue)
      : (Seq[String], PathState) = {
    val newHorizon = math.max(st.lastFinalTs, horizonUs)
    val (ready, rest) =
      (0 until st.bufTs.length).partition(i => st.bufTs(i) < horizonUs)
    val ordered = ready.sortBy(i => (st.bufTs(i), st.bufId(i)))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    // bridge: the ≤ n−1 most recent finalized types; an n-gram emits
    // for every finalized event whose bridge is already full
    var bridge = st.lastTypes.toVector
    var lastTs = st.lastEventTs
    ordered.foreach { i =>
      val t0 = st.bufType(i)
      val tsI = st.bufTs(i)
      // session boundary: a gap wider than gapUs severs the path — the
      // guard on lastTs keeps the very first event (and the
      // Long.MaxValue default) from ever triggering a reset
      if (lastTs != NoTs && tsI - lastTs > gapUs) bridge = Vector.empty
      if (bridge.length == n - 1) out += (bridge :+ t0).mkString(">")
      bridge = (bridge :+ t0).takeRight(n - 1)
      lastTs = tsI
    }
    val newSt = PathState(bridge.toArray, newHorizon, lastTs,
      rest.map(st.bufTs).toArray, rest.map(st.bufId).toArray,
      rest.map(st.bufType).toArray)
    (out.toSeq, newSt)
  }

  /** One micro-batch step for one user — the pure core of the
    * flatMapGroupsWithState closure, extracted so the watermark-unset
    * policy is unit-testable (an e2e feed cannot exercise it: Spark's
    * own stateful-operator late-record filter eats pre-watermark rows
    * before the operator ever sees them, so pre-epoch inputs never
    * reach the closure in a real stream). `freshRows` carry
    * (tsUs, eventId, type); `wmMs` is getCurrentWatermarkMs()'s value.
    *
    *  - ingest guard: drop rows older than the finalized horizon —
    *    before any finalization lastFinalTs is NoTs, so EVERYTHING
    *    (pre-epoch timestamps included) is kept;
    *  - wmMs == 0 is Spark's watermark-UNSET sentinel, not an epoch-0
    *    horizon (round-10 advice): finalizing against it would raise
    *    the horizon to 0 and brand every pre-1970 event as
    *    beyond-window disorder. Waiting is always safe — finalization
    *    is monotone, so skipping only defers emission. (The conflation
    *    costs one deferred batch for a stream that legitimately
    *    watermarks at exactly epoch 0 — harmless.) */
  private[graft] def stepUser(st0: PathState, freshRows: Seq[(Long, Long, String)],
                              wmMs: Long, n: Int,
                              gapUs: Long = Long.MaxValue): (Seq[String], PathState) = {
    val fresh = freshRows.filter(_._1 >= st0.lastFinalTs)
    val st1 = PathState(st0.lastTypes, st0.lastFinalTs, st0.lastEventTs,
      st0.bufTs ++ fresh.map(_._1), st0.bufId ++ fresh.map(_._2),
      st0.bufType ++ fresh.map(_._3))
    if (wmMs == 0L) (Seq.empty[String], st1)
    else finalizeUpTo(st1, wmMs * 1000L, n, gapUs)
  }

  private[graft] val emptyState: PathState =
    PathState(Array.empty, NoTs, NoTs, Array.empty, Array.empty, Array.empty)

  /** q149's shape: trigrams. */
  def pathTrigrams(events: DataFrame): Dataset[(Long, String)] =
    pathNgrams(events, 3)

  /** [[pathNgrams]] with a session bound: an n-gram never spans a
    * silence longer than `gap` — the streaming twin of q161's
    * sessionized batch paths. */
  def sessionPathNgrams(events: DataFrame, n: Int,
                        gap: java.time.Duration): Dataset[(Long, String)] = {
    require(!gap.isNegative && !gap.isZero, s"session gap must be positive: $gap")
    pathNgrams(events, n, gapUs = gap.toMillis * 1000L)
  }

  /** events must carry (user_id, event_type, ts, event_id) with a
    * watermark already declared on ts (the caller picks the lateness
    * bound — it IS the disorder tolerance). `n` is the path length
    * (bigrams = q133's transition edges, trigrams = q149's journeys);
    * the bridge state grows as n−1 types, nothing else changes.
    * `gapUs` (default: unbounded) is the session silence after which
    * the path bridge resets — see [[sessionPathNgrams]]. */
  def pathNgrams(events: DataFrame, n: Int,
                 gapUs: Long = Long.MaxValue): Dataset[(Long, String)] = {
    require(n >= 2, s"a path needs at least 2 steps, got $n")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, String, java.sql.Timestamp, Long)],
         state: GroupState[PathState]) =>
          val st0 = state.getOption.getOrElse(emptyState)
          // ingest + finalize via stepUser — the guard there enforces
          // the drop semantics (older than the finalized horizon)
          // regardless of whether the engine late-filters input itself
          // (Spark 4 was observed to; the contract must not depend on
          // it), and treats getCurrentWatermarkMs() == 0 as
          // watermark-UNSET rather than an epoch-0 horizon. An event AT
          // the horizon is kept (nothing at the horizon has been
          // finalized — see finalizeUpTo's strict bound).
          val fresh = rows.map(r =>
            (StatefulTime.micros(r._3), r._4, r._2)).toSeq
          val (emitted, st2) =
            stepUser(st0, fresh, state.getCurrentWatermarkMs(), n, gapUs)
          state.update(st2)
          if (st2.bufTs.nonEmpty)
            // flush the tail when the watermark passes it, even if this
            // user never produces another event (see StatefulTime.wakeMs)
            state.setTimeoutTimestamp(
              StatefulTime.wakeMs(state.getCurrentWatermarkMs(), st2.bufTs.min))
          emitted.iterator.map(p => (uid, p))
      }
  }
}
