package graft.util

import org.apache.spark.sql.SparkSession

/** Planner pinning for the continuous tier's per-batch actions.
  *
  * Every join in the maintained-state hot loop is explicitly broadcast
  * (LocalRelation or delta-sized build sides) and every per-batch aggregate
  * returns one row per (query, side) — there is nothing for adaptive
  * execution to improve, and its per-query-stage barriers serialize the
  * unioned count plan's branches and add a fixed driver round-trip per
  * stage (profiled at 40k-op batches on sf0.1: min action-sum 15.4s with
  * AQE on vs 5.8s off; the 126-node union plan builds ~50 query stages).
  * Batch application pins it OFF for the duration of one batch and
  * restores the caller's setting after.
  *
  * CONCURRENCY CONTRACT: the pin mutates session-global SQLConf, so it
  * assumes the session is driven by ONE thread while a batch is in flight —
  * an ad-hoc query planned concurrently in the same session during a batch
  * would lose AQE for that window, and a Limits.runWithTimeout cancellation
  * can leave the worker thread's deferred restore racing a subsequent pin.
  * The continuous tier's drivers (MultiQueryDriver, StreamGraph) are
  * single-threaded per session by construction, which is why the pin is a
  * conf flip and not a cloned session; callers that need concurrent ad-hoc
  * work during batches should hand the driver `spark.newSession()` (shared
  * context and state, independent SQLConf) instead.
  */
object BatchConf {

  private val Key = "spark.sql.adaptive.enabled"

  /** Run `f` with adaptive query execution disabled, restoring the
    * session's previous setting afterwards. Reentrant-safe: nested calls
    * just re-pin the same value. */
  def withStaticPlan[T](spark: SparkSession)(f: => T): T =
    if (sys.env.get("GRAFT_KEEP_AQE").contains("1")) f
    else {
      val prev = spark.conf.get(Key, "true")
      spark.conf.set(Key, "false")
      try f finally spark.conf.set(Key, prev)
    }
}
