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
  * join on label). The neighbor min is algebraic ⇒ partial aggregation
  * absorbs hub skew. The JUMP join is the skew hazard: its key is `label`,
  * whose distribution collapses toward one hot key per component as
  * convergence approaches — on a web graph (one giant component) that is a
  * single key carrying O(|V|) rows. Mitigation (north rule "key salting +
  * broadcast of the hot frontier"): once the label distribution concentrates
  * (approx distinct labels ≪ rows, tracked for free in the per-superstep
  * aggregate), labels with count > `hotLabelThreshold` are detected by an
  * algebraic groupBy (itself skew-free), the probe side gets a deterministic
  * salt in [0, saltK) from xxhash64(id), and the tiny hot slice of the
  * (unique-key) build side is broadcast-replicated once per salt — per-key
  * shuffle rows are bounded by max(hotLabelThreshold, rows/saltK).
  *
  * The edge table is persisted once; state is lineage-truncated per
  * superstep. This is the tabular form of union-find — the reference has no
  * CC, but its iterative index-propagation loops (SymBi InsertionTopDown
  * queues, symbi.cpp:404-468) are the same propagate-until-no-change shape.
  */
final class ConnectedComponents(maxIter: Int = 50,
                                hotLabelThreshold: Long = 1000000L,
                                saltK: Int = 16) extends Algorithm {

  /** Supersteps that took the salted-jump path (visible for tests/metrics). */
  @volatile var saltedSupersteps: Int = 0

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
    // Undirected view: propagate along both directions. Repartitioned by
    // src ONCE (opt round 6, guide §2.4): dropDuplicates leaves (src,dst)
    // partitioning, which does NOT satisfy the per-superstep neighbor-min
    // join on src — without this the full undirected table re-exchanged
    // every superstep (the same fixed cost LabelPropagation/PageRank.prepare
    // already eliminate).
    // (repartition FIRST: HashPartitioning(src) satisfies the (src,dst)
    // dedup's clustering, so the dedup runs in-place — one exchange total)
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .repartition(parts, col("src"))
      .dropDuplicates("src", "dst")
      .persist()
    // hint joins shuffle_hash only past a size floor (opt round 6): on a
    // fixture-scale graph the forced hint blocks AQE's broadcast choice and
    // costs ~12 needless small shuffles per run; on a big graph it stops
    // SMJ re-sorting the edge table every superstep. The count is free —
    // it materializes the persist either way.
    val bigGraph = und.count() > 100000L
    def sh(df: DataFrame): DataFrame = if (bigGraph) df.hint("shuffle_hash") else df

    var state = init.getOrElse(vertices.select(col("id")).distinct()
      .withColumn("label", col("id"))).localCheckpoint(true).persist()
    var it = 0
    var changed = Long.MaxValue
    var approxLabels = Long.MaxValue // from the previous superstep's agg
    var rowsPrev = Long.MaxValue
    saltedSupersteps = 0
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    while (it < maxIter && changed > 0) {
      val t0 = System.nanoTime()
      // (1) neighbor min: for each dst, min over labels of its in-neighbors.
      // shuffle-hash (opt round 6, guide §3.1): state fits per-partition
      // hash maps; SMJ would re-sort the big und side every superstep.
      val nbrMin = und.join(sh(state), und("src") === state("id"))
        .groupBy(und("dst").as("id")).agg(min(col("label")).as("nbrMin"))
      val cand = state.join(sh(nbrMin), Seq("id"), "left_outer")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbrMin"), col("label"))).as("cand"))
      // (2) pointer jump: label(label(v)) — compresses label chains. Probe
      // key = `label` (concentrates as components merge); build side is
      // unique-key. Salted once the distribution is provably concentrated.
      val ptr = state.select(col("id").as("lid"), col("label").as("plabel"))
      // a hot label needs > hotLabelThreshold member rows, impossible when
      // the whole state has fewer — skip the per-superstep hot probe (a
      // full groupBy + checkpoint + count, 2 extra jobs) below that size:
      // small/mid graphs pay zero probes, the 100 TB regime still probes
      val concentrated = rowsPrev > hotLabelThreshold && approxLabels < rowsPrev / 4
      def plainJump(): DataFrame =
        cand.join(sh(ptr), cand("label") === ptr("lid"), "left_outer")
          .select(col("id"), col("label"),
            least(col("cand"), coalesce(col("plabel"), col("cand"))).as("newLabel"))
      // hot labels by algebraic count (partial agg absorbs the hot key);
      // only probed in the concentrated regime, and the salted plan only
      // replaces the plain one when a label actually exceeds the threshold
      lazy val hot = state.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .where(col("n") > hotLabelThreshold).select(col("label").as("hl"))
        .localCheckpoint(true)
      val next =
        if (!concentrated || hot.limit(1).count() == 0) plainJump()
        else {
          saltedSupersteps += 1
          val candS = cand
            .join(broadcast(hot), cand("label") === col("hl"), "left_outer")
            .withColumn("salt",
              when(col("hl").isNotNull, pmod(xxhash64(col("id")), lit(saltK.toLong)))
                .otherwise(lit(0L)))
          // build side: cold rows once at salt 0; hot-label rows replicated
          // per salt (the broadcast-the-hot-frontier half of the rule)
          val ptrHot = ptr.join(broadcast(hot), ptr("lid") === col("hl"), "left_semi")
            .withColumn("psalt", explode(array((0 until saltK).map(s => lit(s.toLong)): _*)))
          val ptrCold = ptr.join(broadcast(hot), ptr("lid") === col("hl"), "left_anti")
            .withColumn("psalt", lit(0L))
          val ptr2 = ptrCold.unionByName(ptrHot)
          candS.join(ptr2,
              candS("label") === ptr2("lid") && candS("salt") === ptr2("psalt"),
              "left_outer")
            .select(candS("id"), candS("label"),
              least(col("cand"), coalesce(col("plabel"), col("cand"))).as("newLabel"))
        }

      // LAZY checkpoint + aggregate = ONE action per superstep (opt round
      // 6): the agg materializes the checkpoint, and the commit/state reads
      // the materialized result (no double compute, one fewer job).
      val nextChk = next.localCheckpoint(false)
      val agg = nextChk.agg(
        sum(when(col("newLabel") =!= col("label"), 1L).otherwise(0L)).as("changed"),
        count(lit(1)).as("rows"),
        approx_count_distinct(col("newLabel")).as("labels")).head()
      // sum() over zero rows is null: an EMPTY graph (e.g. a scoped delete
      // recompute whose touched vertices all died) converges immediately
      changed = if (agg.isNullAt(0)) 0L else agg.getLong(0)
      val rows = agg.getLong(1)
      approxLabels = agg.getLong(2)
      rowsPrev = rows
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
