package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.state.StateStore

/** Synchronous label propagation (community detection).
  *
  * Per superstep every vertex adopts the MODE of its neighbors' labels with
  * a deterministic tie-break (smallest label wins) — determinism is
  * non-negotiable (north rule: exact label agreement across `local[8]` and
  * `local[32]`), so no randomized tie-breaking or async order sensitivity.
  * Isolated vertices keep their own label. Synchronous LP can oscillate on
  * bipartite-ish structures, so the loop stops at `maxIter` even when not
  * stable — again deterministically.
  *
  * Shape per superstep: groupBy(dst, label).count → per-dst argmax as a
  * SECOND algebraic aggregate — max over struct(n, -label, label), whose
  * lexicographic order encodes the (count desc, label asc) tie-break. Both
  * aggregates are partial-agg (map-side combined), so hub fan-in AND the
  * argmax are skew-free; no sort-based window anywhere (a per-vertex
  * row_number window costs a sort per partition and was the dominant
  * superstep term at bench scale).
  */
final class LabelPropagation(maxIter: Int = 10) extends Algorithm {

  override def name: String = "labelprop"

  override def run(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                   store: Option[StateStore] = None): AlgoResult = {
    // repartition by src ONCE (dropDuplicates leaves (src,dst) partitioning,
    // which does NOT satisfy the per-superstep join on src — the full
    // undirected table would re-exchange every superstep, the same fixed
    // cost PageRank.prepare eliminates for adj)
    // ONE exchange (opt round 6, guide §2.4): repartition by src FIRST —
    // HashPartitioning(src) satisfies the (src,dst) dedup's clustering
    // requirement (src ⊆ {src,dst}), so dropDuplicates runs in-place and
    // the old dedup-exchange + repartition-exchange pair collapses to one.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .repartition(parts, col("src"))
      .dropDuplicates("src", "dst")
      .localCheckpoint(true)

    var state = vertices.select(col("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true).persist()
    var it = 0
    var changed = Long.MaxValue
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    while (it < maxIter && changed > 0) {
      val t0 = System.nanoTime()
      val next = step(und, state)
      // LAZY checkpoint + aggregate = ONE action per superstep (opt round
      // 6, guide §1.2): the eager checkpoint was a separate job whose rows
      // the immediately-following agg re-scanned anyway; the agg now
      // materializes the checkpoint as a side effect (Bfs.depths' fusion).
      val nextChk = next.localCheckpoint(false)
      val agg = nextChk.agg(
        sum(when(col("newLabel") =!= col("label"), 1L).otherwise(0L)).as("changed"),
        count(lit(1)).as("rows")).head()
      changed = agg.getLong(0)
      val wallMs = (System.nanoTime() - t0) / 1000000L

      it += 1
      val m = SuperstepMetrics(it, wallMs, agg.getLong(1), 0.0, 0.0, changed)
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

  /** One synchronous LP superstep: (id, label, newLabel). Exposed for the
    * single-step DuckDB-oracle query. */
  def step(und: DataFrame, state: DataFrame): DataFrame = {
    // shuffle-hash: the state side fits per-partition hash maps; SMJ would
    // re-sort the big und side every superstep
    val nbrLabels = und.join(state.hint("shuffle_hash"), und("src") === state("id"))
      .select(und("dst").as("id"), col("label"))
    val counts = nbrLabels.groupBy(col("id"), col("label")).agg(count(lit(1)).as("n"))
    // argmax by (n desc, label asc): max of struct(n, -label, label) —
    // lexicographic struct comparison, algebraic, no window/sort
    val mode = counts.groupBy(col("id"))
      .agg(max(struct(col("n"), (-col("label")).as("negl"), col("label"))).as("m"))
      .select(col("id"), col("m.label").as("modeLabel"))
    state.join(mode, Seq("id"), "left_outer")
      .select(col("id"), col("label"),
        coalesce(col("modeLabel"), col("label")).as("newLabel"))
  }
}
