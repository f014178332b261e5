package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user path state: the ≤2 most recent FINALIZED event types (the
  * trigram bridge across batches), the finalization horizon, and the
  * buffer of events still inside the lateness window — parallel arrays
  * for a flat product encoder. */
case class PathState(lastTypes: Array[String], lastFinalTs: Long,
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
  *  - State per user: the ≤2 last finalized event types (the trigram
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
  *
  * Emits one (user_id, "a>b>c") row per finalized trigram occurrence
  * (Update mode); a consumer aggregates counts. PathStreamSpec pins
  * stream ≡ batch trigram multisets under controlled disorder within
  * the lateness bound.
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
    * the boundary. Returns (emitted, newState). */
  private[graft] def finalizeUpTo(st: PathState, horizonUs: Long, n: Int)
      : (Seq[String], PathState) = {
    val newHorizon = math.max(st.lastFinalTs, horizonUs)
    val (ready, rest) =
      (0 until st.bufTs.length).partition(i => st.bufTs(i) < horizonUs)
    val ordered = ready.sortBy(i => (st.bufTs(i), st.bufId(i)))
    val out = scala.collection.mutable.ArrayBuffer[String]()
    // bridge: the ≤ n−1 most recent finalized types; an n-gram emits
    // for every finalized event whose bridge is already full
    var bridge = st.lastTypes.toVector
    ordered.foreach { i =>
      val t0 = st.bufType(i)
      if (bridge.length == n - 1) out += (bridge :+ t0).mkString(">")
      bridge = (bridge :+ t0).takeRight(n - 1)
    }
    val newSt = PathState(bridge.toArray, newHorizon,
      rest.map(st.bufTs).toArray, rest.map(st.bufId).toArray,
      rest.map(st.bufType).toArray)
    (out.toSeq, newSt)
  }

  /** q149's shape: trigrams. */
  def pathTrigrams(events: DataFrame): Dataset[(Long, String)] =
    pathNgrams(events, 3)

  /** events must carry (user_id, event_type, ts, event_id) with a
    * watermark already declared on ts (the caller picks the lateness
    * bound — it IS the disorder tolerance). `n` is the path length
    * (bigrams = q133's transition edges, trigrams = q149's journeys);
    * the bridge state grows as n−1 types, nothing else changes. */
  def pathNgrams(events: DataFrame, n: Int): Dataset[(Long, String)] = {
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
          val st0 = state.getOption.getOrElse(
            PathState(Array.empty, NoTs, Array.empty, Array.empty, Array.empty))
          // ingest, dropping disorder beyond the already-finalized
          // horizon. Spark 4's flatMapGroupsWithState was OBSERVED to
          // late-filter input rows itself, but that behavior is not
          // part of this operator's contract — the guard enforces the
          // drop semantics regardless of engine version/config. An
          // event AT the horizon is kept (nothing at the horizon has
          // been finalized — see finalizeUpTo's strict bound).
          val fresh = rows.map(r => (r._3.getTime * 1000L + (r._3.getNanos / 1000) % 1000,
            r._4, r._2)).filter(_._1 >= st0.lastFinalTs).toSeq
          val st1 = PathState(st0.lastTypes, st0.lastFinalTs,
            st0.bufTs ++ fresh.map(_._1), st0.bufId ++ fresh.map(_._2),
            st0.bufType ++ fresh.map(_._3))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (emitted, st2) = finalizeUpTo(st1, wmUs, n)
          state.update(st2)
          if (st2.bufTs.nonEmpty) {
            // flush the tail when the watermark passes it, even if this
            // user never produces another event; must be strictly
            // beyond the current watermark AND beyond the buffered
            // timestamp (finalization is strict-below-horizon)
            val wakeMs = math.max(state.getCurrentWatermarkMs() + 1,
              st2.bufTs.min / 1000L + 1)
            state.setTimeoutTimestamp(wakeMs)
          }
          emitted.iterator.map(p => (uid, p))
      }
  }
}
