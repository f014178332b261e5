package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user attribution state: the last finalized non-purchase touch
  * (NoTs/null when none yet), the timestamp of the last finalized
  * event of ANY type (for session-gap severing — NoTs when none), the
  * finalization horizon, and the buffer of events still inside the
  * lateness window — parallel arrays for a flat product encoder (the
  * PathState layout).
  *
  * STATE-SCHEMA COMPATIBILITY: `lastEventTs` was added in round 12 for
  * the session-scoped variant. Spark state encoders are positional, so
  * a checkpoint written by the round-11 6-field layout will not
  * restore against this class — restart such a stream from a fresh
  * checkpoint (see the PathState note for the same contract). */
case class AttrState(touchTs: Long, touchType: String, lastEventTs: Long,
                     lastFinalTs: Long,
                     bufTs: Array[Long], bufId: Array[Long],
                     bufType: Array[String], bufValue: Array[Double])

/** Streaming LAST-TOUCH ATTRIBUTION — q163's twin, and the second
  * instantiation of the WATERMARK-ORDERED REPLAY pattern
  * ([[StreamingPaths]] is the first): attribution is order-DEPENDENT
  * (the credit goes to the latest touch BEFORE the purchase, so a
  * late-arriving click can change a purchase's channel), hence no
  * order-independent sufficient statistic exists and events must
  * finalize in (ts, event_id) order below the advancing watermark.
  *
  *  - State per user: the last finalized touch (one (ts, type) pair —
  *    the running-struct carry q163 keeps in its window) + the
  *    buffered suffix, bounded by rate × lateness window;
  *  - a finalized PURCHASE emits (user, channel, value) where channel
  *    is the carried touch if within [[graft.ops.Relational.AttributionWindowUs]],
  *    else 'direct'; a finalized non-purchase replaces the carry;
  *  - the SESSION-SCOPED variant ([[sessionAttributedPurchases]],
  *    q172's twin) additionally severs the carry when more than the
  *    gap of event-time silence precedes a finalized event — the
  *    StreamingPaths session rule applied to the touch carry;
  *  - event-time timeout flushes users the data stopped touching;
  *    disorder beyond the finalized horizon is dropped; the
  *    watermark-unset sentinel (0) defers finalization, all exactly as
  *    in StreamingPaths (see stepUser there for the rationale).
  *
  * Emits one row per finalized purchase (Update mode); a consumer
  * aggregates per channel. AttributionStreamSpec pins stream ≡ batch
  * (q163's attributedPurchases / q172's sessionAttributedPurchases)
  * under controlled disorder, the late-click-changes-the-channel case,
  * and checkpointed restart. */
object StreamingAttribution {

  private val NoTs = Long.MinValue

  private[graft] val emptyState: AttrState =
    AttrState(NoTs, null, NoTs, NoTs, Array.empty, Array.empty, Array.empty, Array.empty)

  /** One micro-batch step for one user (the testable pure core —
    * [[StreamingPaths.stepUser]]'s shape). `freshRows` carry
    * (tsUs, eventId, type, value). `gapUs` = Long.MaxValue disables
    * session severing (the q163 rule). Returns (emitted
    * (channel, value) pairs, new state). */
  private[graft] def stepUser(st0: AttrState,
                              freshRows: Seq[(Long, Long, String, Double)],
                              wmMs: Long, windowUs: Long,
                              gapUs: Long = Long.MaxValue)
      : (Seq[(String, Double)], AttrState) = {
    val fresh = freshRows.filter(_._1 >= st0.lastFinalTs)
    val st1 = AttrState(st0.touchTs, st0.touchType, st0.lastEventTs, st0.lastFinalTs,
      st0.bufTs ++ fresh.map(_._1), st0.bufId ++ fresh.map(_._2),
      st0.bufType ++ fresh.map(_._3), st0.bufValue ++ fresh.map(_._4))
    if (wmMs == 0L) return (Seq.empty, st1)
    val horizonUs = wmMs * 1000L
    val newHorizon = math.max(st1.lastFinalTs, horizonUs)
    val (ready, rest) =
      (0 until st1.bufTs.length).partition(i => st1.bufTs(i) < horizonUs)
    val ordered = ready.sortBy(i => (st1.bufTs(i), st1.bufId(i)))
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var touchTs = st1.touchTs
    var touchType = st1.touchType
    var lastEventTs = st1.lastEventTs
    ordered.foreach { i =>
      // session sever BEFORE processing the event: a silence longer
      // than the gap orphans the carried touch (q172's new_sess rule)
      if (lastEventTs != NoTs && st1.bufTs(i) - lastEventTs > gapUs) {
        touchTs = NoTs
        touchType = null
      }
      if (st1.bufType(i) == "purchase") {
        val channel =
          if (touchType != null && st1.bufTs(i) - touchTs <= windowUs) touchType
          else "direct"
        out += ((channel, st1.bufValue(i)))
      } else {
        touchTs = st1.bufTs(i)
        touchType = st1.bufType(i)
      }
      lastEventTs = st1.bufTs(i)
    }
    (out.toSeq, AttrState(touchTs, touchType, lastEventTs, newHorizon,
      rest.map(st1.bufTs).toArray, rest.map(st1.bufId).toArray,
      rest.map(st1.bufType).toArray, rest.map(st1.bufValue).toArray))
  }

  /** events must carry (user_id, event_type, ts, event_id, value) with
    * a watermark declared on ts. Emits (user_id, channel, value) per
    * finalized purchase. */
  def attributedPurchases(events: DataFrame,
      windowUs: Long = graft.ops.Relational.AttributionWindowUs)
      : Dataset[(Long, String, Double)] =
    run(events, windowUs, gapUs = Long.MaxValue)

  /** q172's streaming twin: [[attributedPurchases]] with the carry
    * severed at session boundaries (> `gapUs` of event-time silence). */
  def sessionAttributedPurchases(events: DataFrame,
      windowUs: Long = graft.ops.Relational.AttributionWindowUs,
      gapUs: Long = graft.ops.Relational.AttributionSessionGapUs)
      : Dataset[(Long, String, Double)] =
    run(events, windowUs, gapUs)

  private def run(events: DataFrame, windowUs: Long, gapUs: Long)
      : Dataset[(Long, String, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .as[(Long, String, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, String, java.sql.Timestamp, Long, Double)],
         state: GroupState[AttrState]) =>
          val st0 = state.getOption.getOrElse(emptyState)
          val fresh = rows.map(r =>
            (StatefulTime.micros(r._3), r._4, r._2, r._5)).toSeq
          val (emitted, st2) =
            stepUser(st0, fresh, state.getCurrentWatermarkMs(), windowUs, gapUs)
          state.update(st2)
          if (st2.bufTs.nonEmpty)
            state.setTimeoutTimestamp(
              StatefulTime.wakeMs(state.getCurrentWatermarkMs(), st2.bufTs.min))
          emitted.iterator.map { case (ch, v) => (uid, ch, v) }
      }
  }
}
