package graft.ops

import org.apache.spark.sql.DataFrame

/** Session plumbing for the iterate-via-aggregation fits (k-means,
  * logreg GD, BPE merge training — r19 optimization).
  *
  * Each fit iteration is ONE digest-sized aggregation job (k·dim /
  * Dim+2 / 1 result rows), but under AQE every such job pays
  * per-stage re-planning latency — measured ~10–15 ms per iteration
  * at sf0.1, ~0.3 s across a 24-iteration logreg fit and ~0.35 s
  * across a k-means guard+seed+iterate sequence — for an adaptive
  * optimizer with nothing to adapt (the shuffle is a single-row
  * exchange; join strategy and skew handling never apply). The fix
  * must NOT touch the caller's session conf: the test suites share
  * one session across parallel suites, and a seconds-long AQE toggle
  * would change concurrent plans mid-analysis (the
  * Tables.sniffEventsTs race class, but held for a whole fit).
  *
  * So the loop's frames are rebound onto a `newSession()` CLONE with
  * AQE disabled: same SparkContext, same SharedState CacheManager (a
  * frame persisted by the caller resolves in the clone), fully
  * session-local conf. Queries the fit RETURNS to callers stay on the
  * caller's session — only the internal digest jobs run on the clone.
  */
object IterFit {
  def rebindNoAqe(df: DataFrame): DataFrame = {
    val child = df.sparkSession.newSession()
    child.conf.set("spark.sql.adaptive.enabled", "false")
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(
      child, df.queryExecution.logical)
  }
}
