package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.algo.AlgoResult
import graft.graph.GraphUpdate

/** Structured-Streaming ingestion of the update stream — the realized form
  * of the reference's aspirational Flink-style dataflow sketch
  * (ParaCOSM/Stream/main.cpp:16-30: addDataGraphSource /
  * addUpdateGraphSource / execute) and of its shipped micro-batch window
  * protocol (BatchUpdates3, main.cpp:253-397): each micro-batch is
  * classified (safe/unsafe), safe updates fold into state without
  * recompute, unsafe ones trigger the incremental algorithm.
  *
  * Three continuously-maintained results:
  *  - connected components (warm-start on adds, cold on deletes);
  *  - the TRIANGLE COUNT via delta joins (J3/J4): per batch,
  *    count += touching(E_new, added) − touching(E_old, deleted) — the
  *    reference's positive/negative result counters
  *    (graphflow.cpp:289-416), never a from-scratch recount. This is
  *    continuous subgraph matching for Q = C₃ on the stream;
  *  - PAGERANK via warm restarts (PageRank.runFrom): carried ranks converge
  *    to the cold fixpoint in a handful of supersteps on small deltas.
  *
  * State lives in driver-held DataFrames that are localCheckpoint'd per
  * batch (single-process tier); on a cluster the same code commits per-batch
  * snapshots through StateStore instead — same call shape.
  */
final class StreamGraph(spark: SparkSession,
                        initialVertices: DataFrame,
                        initialEdges: DataFrame,
                        maintainTriangles: Boolean = false,
                        maintainPageRank: Boolean = false,
                        prTol: Double = 1e-6,
                        compactEvery: Int = 8) {

  @volatile var vertices: DataFrame = initialVertices.localCheckpoint(true)
  @volatile var edges: DataFrame = initialEdges.localCheckpoint(true)
  private val roller = new graft.util.StateRoller
  private var rollsSinceCompact = 0

  /** Incrementally-maintained prepared PageRank inputs: a FIXED
    * co-partitioned base adjacency plus a tiny signed patch, vertex state
    * by delta arithmetic (PageRank.updatePrepared) — a warm-restart batch
    * never re-shuffles the full edge table (round-3 rebuilt Prepared per
    * micro-batch: an O(|E|) groupBy + two joins + checkpoints every batch).
    * Rebuilt from scratch only when the patch outgrows its threshold. */
  @volatile var prPrepared: graft.algo.PageRank.Prepared =
    if (!maintainPageRank) null
    else graft.algo.PageRank.prepare(spark, edges, vertices)
  @volatile private var prBaseEdges: Long =
    if (maintainPageRank) prPrepared.adj.count() else 0L
  /** Patch-size threshold before a base rebuild (absolute + relative). */
  private def patchLimit: Long = 1000L + prBaseEdges / 20L

  /** Maintained (id, rank) and the supersteps each refresh took — warm
    * starts converge in a handful of iterations on small deltas, the
    * measurable payoff of incremental maintenance vs recompute. */
  @volatile var prRanks: DataFrame =
    if (!maintainPageRank) null
    else new graft.algo.PageRank(tol = prTol).runOnPrepared(spark, prPrepared)
      .state.localCheckpoint(true)
  @volatile var prIterations: Seq[Int] = Seq.empty
  @volatile var prIterationsSum: Long = 0L
  @volatile var prRebuilds: Long = 0L
  /** Driver-maintained UPPER BOUND on the PageRank patch's row count: each
    * batch adds ≤ |addD|+|delD| distinct keys and compaction only shrinks.
    * Using the bound for the rebuild threshold is conservative (rebuild at
    * worst slightly early, never late) and saves the per-batch count job the
    * old exact probe paid — the tier's 4-actions-per-batch discipline. */
  @volatile private var prPatchBound: Long = 0L
  @volatile var ccState: DataFrame =
    new graft.algo.ConnectedComponents(maxIter = 60)
      .run(spark, edges, vertices).state.localCheckpoint(true)
  @volatile var totalSafe: Long = 0L
  @volatile var totalUnsafe: Long = 0L
  @volatile var batchesSeen: Long = 0L
  @volatile var triangleCount: Long =
    if (maintainTriangles)
      graft.algo.TriangleCount.countTriangles(spark, edges).head().getLong(0)
    else -1L
  @volatile var trianglePositive: Long = 0L // G2 counters
  @volatile var triangleNegative: Long = 0L

  /** Observability for the component-scoped delete path: vertex count of the
    * subgraph the last delete-bearing batch actually recomputed (-1 = no
    * scoped recompute yet), and how many delete batches took the scoped vs
    * the full path. Tests pin that a delete in a small component recomputes
    * only that component, never the giant one. */
  @volatile var lastCcScopeVertices: Long = -1L
  @volatile var ccScopedRecomputes: Long = 0L
  @volatile var ccFullRecomputes: Long = 0L
  /** Per-superstep metrics of the last batch's CC refresh — row counts prove
    * the scoped path iterated over the touched components only. */
  @volatile var lastCcMetrics: Seq[graft.algo.SuperstepMetrics] = Seq.empty
  /** Scope sizes above this take the full recompute: a near-full scope's
    * semi-joins would broadcast a huge id set for no savings. */
  var ccScopeBroadcastLimit: Long = 2000000L

  /** Attach to a streaming Dataset[GraphUpdate]; every micro-batch runs the
    * classify → apply → (maybe) recompute protocol. */
  def start(updates: Dataset[GraphUpdate], trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    updates.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[GraphUpdate], _: Long) =>
        val ops = batch.collect().toSeq.sortBy(_.seq)
        if (ops.nonEmpty) applyLocal(ops)
        ()
      }
      .start()
  }

  /** One micro-batch via the driver-local fast path (the same discipline as
    * MultiQueryDriver.applyBatchLocal): the |Δ|-sized batch is driver-held,
    * so classification, the two delta derivations, and the vertex
    * membership diff cost one probe action each; graph state rolls through
    * persisted leaves (StateRoller) instead of per-batch full checkpoints. */
  def applyLocal(ops: Seq[GraphUpdate]): Unit =
    graft.util.BatchConf.withStaticPlan(spark)(applyLocalImpl(ops))

  /** Delete-bearing batches: recompute connected components ONLY inside the
    * components that could change — those containing an endpoint of any edge
    * op or the id of any vertex op in the batch. Every other component kept
    * its exact edge set (nothing incident was added or removed — an old edge
    * never crosses old components, and a new edge's endpoints are touched,
    * hence affected), so its rows — label = component-min id — carry over
    * verbatim, and kept ∪ scoped-result equals the from-scratch labeling.
    *
    * Cost: one |Δ|-bounded touched-label probe, one scope materialization +
    * count, two broadcast semi-join scans (V, E — single pass each, no
    * shuffle), then the O(log|scope|) CC loop over the SCOPED subgraph —
    * per-batch work proportional to the touched components instead of the
    * old O(|E|·log|V|) whole-graph recompute (the reference also recomputes
    * from scratch on any unsafe batch, ParaCOSM/Stream/main.cpp:301-313).
    * When the scope outgrows the broadcast limit the full recompute runs
    * instead (scoped ≈ full there, and a huge broadcast would only hurt). */
  private def scopedCcDelete(ops: Seq[GraphUpdate]): AlgoResult = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    val touched = ops.flatMap(u =>
      if (u.op == "e" || u.op == "-e") Seq(u.id1, u.id2) else Seq(u.id1)).distinct
    // old labels of the touched ids (|Δ|-bounded collect); touched ids with
    // no old row are this batch's new vertices — scope seeds of their own
    val tRows = ccState
      .join(broadcast(graft.util.DeltaDF.of(spark, touched.map(Tuple1(_)), "id")),
        Seq("id"), "left_semi")
      .select(col("id"), col("label")).collect()
    val affected = tRows.map(_.getLong(1)).distinct.toSeq
    val newIds = (touched.toSet -- tRows.map(_.getLong(0))).toSeq
    val affDf = broadcast(affected.toDF("label"))
    val scopeIds = ccState.join(affDf, Seq("label"), "left_semi").select(col("id"))
      .union(newIds.toDF("id"))
      .localCheckpoint(true)
    val scopeN = scopeIds.count()
    lastCcScopeVertices = scopeN
    if (scopeN > ccScopeBroadcastLimit) {
      ccFullRecomputes += 1
      scopeIds.unpersist(false)
      new graft.algo.ConnectedComponents(maxIter = 60).run(spark, edges, vertices)
    } else {
      ccScopedRecomputes += 1
      val subV = vertices.join(broadcast(scopeIds), Seq("id"), "left_semi")
      val subE = edges.join(
        broadcast(scopeIds.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
      val sub = new graft.algo.ConnectedComponents(maxIter = 60).run(spark, subE, subV)
      val kept = ccState.join(affDf, Seq("label"), "left_anti")
        .select(col("id"), col("label"))
      val merged = kept.union(sub.state.select(col("id"), col("label")))
        .localCheckpoint(true)
      sub.state.unpersist(false)
      scopeIds.unpersist(false)
      AlgoResult(merged, sub.iterations, sub.metrics)
    }
  }

  private def applyLocalImpl(ops: Seq[GraphUpdate]): Unit = {
    import spark.implicits._
    val e0 = edges
    val v0 = vertices

    // classification (classifyForCC's rule, labels probed in one action):
    // an edge insert whose endpoints share a CC label is safe; vertex adds
    // are safe; everything else (unknown labels included) is unsafe
    val eIds = ops.filter(_.op == "e").flatMap(u => Seq(u.id1, u.id2)).distinct
    val lbl: Map[Long, Long] =
      if (eIds.isEmpty) Map.empty
      else ccState.join(
          org.apache.spark.sql.functions.broadcast(
            graft.util.DeltaDF.of(spark, eIds.map(Tuple1(_)), "id")), Seq("id"), "left_semi")
        .select(col("id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nSafe = ops.count(u => u.op == "v" ||
      (u.op == "e" && lbl.get(u.id1).exists(l => lbl.get(u.id2).contains(l)))).toLong
    val nUnsafe = ops.size - nSafe

    val (v1v, e1v) = Updates.applyBatchUnlabeledLocal(spark, v0, e0, ops)
    val Seq(v1, e1) = roller.roll(Seq(v1v, e1v))
    vertices = v1
    edges = e1
    rollsSinceCompact += 1
    if (rollsSinceCompact >= compactEvery) {
      vertices = vertices.localCheckpoint(true)
      edges = edges.localCheckpoint(true)
      roller.clear()
      rollsSinceCompact = 0
    }

    val hasDelete = ops.exists(u => u.op == "-v" || u.op == "-e")
    val res =
      if (nUnsafe == 0) {
        val newV = vertices.join(ccState.select(col("id")), Seq("id"), "left_anti")
          .withColumn("label", col("id"))
        AlgoResult(ccState.union(newV), 0, Seq.empty)
      } else if (!hasDelete) {
        val cc = new graft.algo.ConnectedComponents(maxIter = 60)
        val warmInit = ccState.union(
          vertices.join(ccState.select(col("id")), Seq("id"), "left_anti")
            .withColumn("label", col("id")))
        cc.runFrom(spark, edges, vertices, warmInit)
      } else {
        scopedCcDelete(ops)
      }
    ccState = res.state.localCheckpoint(true)
    lastCcMetrics = res.metrics
    totalSafe += nSafe
    totalUnsafe += nUnsafe
    batchesSeen += 1

    if (maintainTriangles) {
      // canonical delta from the batch's OWN ops, ONE probe action over
      // before and after, keys collected (|Δ|-bounded)
      val (addK, delK) = Updates.edgeDeltaKeysCollected(spark, e0, edges, ops)
      // tri(e1) = tri(e0) + |tri(e1) ∋ added| − |tri(e0) ∋ deleted|:
      // a created triangle lives in e1 and uses an added edge, a destroyed
      // one lives in e0 and uses a deleted edge, and the two sets cannot
      // overlap (one is ⊆ e1-only, the other ⊆ e0-only)
      val pos =
        if (addK.isEmpty) 0L
        else graft.matching.DeltaTriangles.countTouching(spark, edges,
          graft.util.DeltaDF.of(spark, addK, "src", "dst"))
      val neg =
        if (delK.isEmpty) 0L
        else graft.matching.DeltaTriangles.countTouching(spark, e0,
          graft.util.DeltaDF.of(spark, delK, "src", "dst"))
      trianglePositive += pos
      triangleNegative += neg
      triangleCount += pos - neg
    }
    if (maintainPageRank) {
      // directed collected delta + driver-side vertex membership diff
      val (addD, delD) = Updates.edgeDeltaDirectedCollected(spark, e0, edges, ops)
      val cand = ops.filter(u => u.op == "v" || u.op == "-v").map(_.id1).distinct
      val (newIds, delIds) =
        if (cand.isEmpty) (Seq.empty[Long], Seq.empty[Long])
        else {
          val candDf = cand.toDF("id")
          val rows = prPrepared.verts
            .join(org.apache.spark.sql.functions.broadcast(candDf), Seq("id"), "left_semi")
            .select(org.apache.spark.sql.functions.lit("p").as("w"), col("id"))
            .unionByName(vertices
              .join(org.apache.spark.sql.functions.broadcast(candDf), Seq("id"), "left_semi")
              .select(org.apache.spark.sql.functions.lit("n").as("w"), col("id")))
            .collect()
          val inPrev = rows.filter(_.getString(0) == "p").map(_.getLong(1)).toSet
          val inNew = rows.filter(_.getString(0) == "n").map(_.getLong(1)).toSet
          ((inNew -- inPrev).toSeq, (inPrev -- inNew).toSeq)
        }
      prPrepared = graft.algo.PageRank.updatePrepared(
        spark, prPrepared, graft.util.DeltaDF.of(spark, addD, "src", "dst"),
        graft.util.DeltaDF.of(spark, delD, "src", "dst"),
        newIds, delIds)
      // rebuild decision from the driver-maintained patch-size BOUND — the
      // exact post-compaction row count isn't worth a per-batch count job
      // (the old probe was the protocol's one action the tier didn't need)
      prPatchBound += addD.size + delD.size
      if (prPatchBound > patchLimit) {
        prPrepared = graft.algo.PageRank.prepare(spark, edges, vertices)
        prBaseEdges = prPrepared.adj.count()
        prRebuilds += 1
        prPatchBound = 0L
      }
      val prRes = new graft.algo.PageRank(tol = prTol)
        .runFromPrepared(spark, prPrepared, prRanks)
      prRanks = prRes.state.localCheckpoint(true)
      prIterationsSum += prRes.iterations
      // bounded history (long streams): the sum above keeps the average
      // derivable after the per-batch list stops growing
      if (prIterations.size < 1024) prIterations = prIterations :+ prRes.iterations
    }
  }
}
