package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.state.StateStore

/** One superstep's observability record (the reference's pruning-funnel
  * counters reborn, ParaCOSM/CSM/matching/matching.h:25-33). */
final case class SuperstepMetrics(
    iteration: Int,
    wallMs: Long,
    rows: Long,
    deltaL1: Double,
    deltaLinf: Double,
    changed: Long)

final case class AlgoResult(state: DataFrame, iterations: Int, metrics: Seq[SuperstepMetrics])

/** The algorithm plug-in surface — the reference's `matching` virtual
  * interface (ParaCOSM/CSM/matching/matching.h:45-57) re-expressed for
  * join-aggregate supersteps over (edges, vertex-state) tables.
  *
  * Lineage control: every implementation truncates per iteration, either via
  * a StateStore commit (durable, resumable — north rule) or
  * `localCheckpoint` (fast path for benches). Without truncation the
  * iteration-k plan references all k-1 predecessors (SURVEY.md §7.4-1).
  */
trait Algorithm {
  def name: String

  /** Run to convergence. `edges` must have (src: Long, dst: Long). */
  def run(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
          store: Option[StateStore] = None): AlgoResult
}

object Algorithm {
  /** Persist-swap helper: truncate lineage of `df` — durable snapshot when a
    * store is given, else an eager localCheckpoint. */
  def truncate(spark: SparkSession, df: DataFrame, store: Option[StateStore],
               name: String, iteration: Int, m: SuperstepMetrics): DataFrame =
    store match {
      case Some(s) =>
        s.commit(spark, name, iteration, df, m.deltaL1, m.deltaLinf, m.changed, m.wallMs)
      case None => df.localCheckpoint(true)
    }
}
