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
  * The session keeps AQE on for ad-hoc queries (Bench/Verify set it);
  * batch application pins it OFF for the duration of one batch and
  * restores the caller's setting after — the same split BASELINE.md
  * documents for the iterative superstep kernel.
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
