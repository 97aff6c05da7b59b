package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Automatic unpersist for operator-internal caches whose lifetime must
  * outlive the operator call but not the session.
  *
  * The problem it solves (VERDICT r14 #5): a Transformer that persists
  * its input before a two-consumer branch cannot unpersist before
  * returning — the returned DataFrame is lazy and the cache must be
  * alive when the caller finally acts on it. "Caller sweeps
  * `clearCache()` between runs" is the right contract for suite runners
  * (Bench/Verify do exactly that) but leaks one cache entry per
  * `transform()` in a long-lived interactive session.
  *
  * [[releaseAfterFirstAction]] closes the gap with a
  * [[QueryExecutionListener]]: once ANY Dataset-level action whose
  * analyzed plan contains the cached plan completes (success or
  * failure — a failed action won't be retried against the cache either),
  * the cache is unpersisted and the listener unregisters itself. The
  * first action materializes both consumers of the shared subtree, so
  * releasing at that point is exactly when the cache has paid for
  * itself; a SECOND action on the same returned DataFrame recomputes —
  * callers that act repeatedly should opt out (the Transformers expose
  * `releaseCacheOnFirstAction`) and own cleanup as before.
  *
  * Scope caveats, deliberate and documented:
  *   - only Dataset-level actions (collect/count/write/...) emit
  *     QueryExecution events; a raw `queryExecution.toRdd` probe (what
  *     Bench times) bypasses the listener — Bench sweeps with
  *     `clearCache()` between runs anyway.
  *   - the listener bus is ASYNC: the release lands shortly after the
  *     action returns, not within it (the lifecycle spec polls).
  *   - if someone else already released the cache (e.g. a global
  *     `clearCache()`), the listener notices the NONE storage level at
  *     the next event and unregisters without touching anything, so
  *     stale listeners cannot accumulate past the next action.
  */
object CacheLifecycle {

  /** Unpersist `cached` once the first Dataset action consuming it
    * completes; returns `result` unchanged for call-site chaining. */
  def releaseAfterFirstAction(cached: DataFrame, result: DataFrame): DataFrame = {
    val spark = cached.sparkSession
    val target = cached.queryExecution.analyzed
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def maybeRelease(qe: QueryExecution): Unit = {
        if (cached.storageLevel == StorageLevel.NONE) {
          // released by someone else (clearCache, explicit unpersist):
          // nothing to free, stop listening
          if (done.compareAndSet(false, true)) spark.listenerManager.unregister(this)
        } else if (qe.analyzed.exists(_.sameResult(target)) &&
            done.compareAndSet(false, true)) {
          cached.unpersist(blocking = false)
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
