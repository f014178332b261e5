package graft.streaming

/** Shared event-time arithmetic for the flatMapGroupsWithState
  * operators (StreamingPaths, StreamingAttribution — the
  * watermark-ordered-replay twins). Single-sourced for the same
  * reason the bucketed-store machinery lives in ops/BucketStore: the
  * two operators carried byte-identical copies of both formulas, and
  * a fix applied to one would silently miss the other.
  */
private[streaming] object StatefulTime {

  /** java.sql.Timestamp → event-time MICROS. `getTime` already
    * carries the whole milliseconds, so only the sub-millisecond
    * remainder of `getNanos` is added — adding the full micros would
    * double-count the ms part. */
  def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  /** Next event-time timeout for a user holding buffered rows: the
    * tail must flush when the watermark passes it even if the user
    * never produces another event, so the wake is strictly beyond the
    * CURRENT watermark and strictly beyond the oldest buffered
    * timestamp (finalization is strict-below-horizon). */
  def wakeMs(currentWatermarkMs: Long, minBufferedUs: Long): Long =
    math.max(currentWatermarkMs + 1, minBufferedUs / 1000L + 1)
}
