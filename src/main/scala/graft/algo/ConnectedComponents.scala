package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.StateStore

/** Connected components by iterative min-label join with pointer jumping.
  *
  * Plain min-label propagation (each vertex takes the min label among itself
  * and its neighbors) needs O(diameter) supersteps — fatal on ring/chain
  * graphs (our fixture sites are rings of P pages). We add the classic
  * pointer-jumping step: after the neighbor-min, each vertex also looks up
  * its OLD label's current label (labels are always vertex ids of the same
  * component, so this is sound) — path compression that converges in
  * O(log n) supersteps instead.
  *
  * Invariants (tested): labels only decrease; a label is always the id of a
  * vertex in the same component; fixpoint ⇒ label is constant per component
  * ⇒ label = component-min id (exact, as the north rule requires — not
  * approximate).
  *
  * Scale notes: two shuffles per superstep (neighbor groupBy-min + the jump
  * join on label). Both are algebraic mins ⇒ partial aggregation absorbs hub
  * skew. The edge table is persisted once; state is lineage-truncated per
  * superstep. This is the tabular form of union-find — the reference has no
  * CC, but its iterative index-propagation loops (SymBi InsertionTopDown
  * queues, symbi.cpp:404-468) are the same propagate-until-no-change shape.
  */
final class ConnectedComponents(maxIter: Int = 50) extends Algorithm {

  override def name: String = "cc"

  override def run(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                   store: Option[StateStore] = None): AlgoResult =
    loop(spark, edges, vertices, store, None)

  /** Warm-start from an existing labeling (incremental CC after edge ADDS:
    * old labels are per-part component minima, so min-propagation from them
    * converges to the merged component's min — sound only for inserts;
    * deletes require a cold run, see graft.stream.Updates). */
  def runFrom(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
              init: DataFrame): AlgoResult =
    loop(spark, edges, vertices, None, Some(init))

  private def loop(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                   store: Option[StateStore], init: Option[DataFrame]): AlgoResult = {
    // Undirected view: propagate along both directions.
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .persist()
    und.count()

    var state = init.getOrElse(vertices.select(col("id")).distinct()
      .withColumn("label", col("id"))).localCheckpoint(true).persist()
    var it = 0
    var changed = Long.MaxValue
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    while (it < maxIter && changed > 0) {
      val t0 = System.nanoTime()
      // (1) neighbor min: for each dst, min over labels of its in-neighbors
      val nbrMin = und.join(state, und("src") === state("id"))
        .groupBy(und("dst").as("id")).agg(min(col("label")).as("nbrMin"))
      val cand = state.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbrMin"), col("label"))).as("cand"))
      // (2) pointer jump: label(label(v)) — compresses label chains
      val ptr = state.select(col("id").as("lid"), col("label").as("plabel"))
      val next = cand.join(ptr, cand("label") === ptr("lid"), "left_outer")
        .select(col("id"), col("label"),
          least(col("cand"), coalesce(col("plabel"), col("cand"))).as("newLabel"))

      // Checkpoint eagerly ONCE, then both the changed-count agg and the
      // durable commit read the materialized result (no double compute).
      val nextChk = next.localCheckpoint(true)
      val agg = nextChk.agg(
        sum(when(col("newLabel") =!= col("label"), 1L).otherwise(0L)).as("changed"),
        count(lit(1)).as("rows")).head()
      changed = agg.getLong(0)
      val rows = agg.getLong(1)
      val wallMs = (System.nanoTime() - t0) / 1000000L

      it += 1
      val m = SuperstepMetrics(it, wallMs, rows, 0.0, 0.0, changed)
      metrics += m
      val newState = nextChk.select(col("id"), col("newLabel").as("label"))
      val prev = state
      state = (store match {
        case Some(s) => s.commit(spark, name, it, newState, 0.0, 0.0, changed, wallMs)
        case None => newState
      }).persist()
      prev.unpersist()
    }

    und.unpersist()
    AlgoResult(state, it, metrics.toSeq)
  }
}
