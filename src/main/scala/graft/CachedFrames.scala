package graft

import org.apache.spark.sql.DataFrame

/** Registry for the library's long-lived persisted frames (the memoized
  * shared inputs in TierA/TierC and the intra-operator persists that
  * outlive their operator call, e.g. [[graft.ext.Sketch.cmsHeavyHitters]]'s
  * counts). Harmless in the bench harness — the JVM exits — but a
  * long-lived server process accumulates cached blocks across
  * sessions/scale factors; `CachedFrames.clear()` is the teardown hook
  * that unpersists everything and resets the memo maps. */
object CachedFrames {

  private val cleanups =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  /** Register a cleanup thunk (unpersist + memo-map reset) to run on
    * [[clear]]. */
  def onClear(f: () => Unit): Unit = { cleanups.add(f); () }

  /** Track one persisted frame: it is unpersisted at the next [[clear]].
    * Returns the frame for inline use. */
  def track(df: DataFrame): DataFrame = {
    onClear(() => { df.unpersist(); () })
    df
  }

  /** Unpersist every tracked frame and run every registered cleanup.
    * Safe to call repeatedly; cleanup errors (e.g. a stopped session)
    * are swallowed so teardown always completes. */
  def clear(): Unit = {
    var f = cleanups.poll()
    while (f != null) {
      try f()
      catch { case scala.util.control.NonFatal(_) => }
      f = cleanups.poll()
    }
  }
}
