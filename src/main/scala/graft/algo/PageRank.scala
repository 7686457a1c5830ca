package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.StateStore

/** PageRank as join-aggregate supersteps (the flagship, SURVEY.md §7.1-4).
  *
  * Probability convention: ranks sum to 1. Per superstep:
  *   r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outDeg(u)  +  danglingMass/N )
  * where danglingMass = Σ r(u) over vertices with outDeg(u)=0. Convergence:
  * L∞(r' − r) < tol.
  *
  * Physical shape — ONE shuffle per superstep (the groupBy(dst) partial+final
  * sum), everything else co-partitioned:
  *  - `adj` (src, dst, salt) is hash-partitioned by src ONCE and
  *    checkpointed; `localCheckpoint` preserves outputPartitioning, so the
  *    per-iteration adj ⋈ ranks join needs no exchange on the adj side.
  *  - the r(u)/outDeg(u) division happens on the RANK side (state carries
  *    outDeg), so adjacency rows are degree-free and IMMUTABLE — which is
  *    what makes the streaming tier's base+patch maintenance possible
  *    (updatePrepared): out-degree changes touch only the vertex state.
  *  - `ranks` carries HashPartitioning(id) out of the previous groupBy/join,
  *    matching both the adj join (src=id) and the verts join (id=id).
  *  - the state carries a precomputed `dangling` flag, so the next
  *    iteration's dangling mass and the delta norms come from ONE scan of
  *    the just-checkpointed state — no extra semi-join job.
  *  - joins take shuffle-hash hints: state fits per-partition hash maps and
  *    avoids re-sorting 10⁷-row inputs every superstep (SMJ would).
  *  - hub in-degree skew is absorbed by map-side partial aggregation (sum is
  *    algebraic) — the reference's thread-local-counter + reduce pattern
  *    (ParaCOSM parallel_graphflow.cpp:988-990) is Spark's default physical agg.
  *  - lineage is truncated every superstep (StateStore commit or
  *    localCheckpoint) — mandatory for iterative Catalyst plans
  *    (SURVEY.md §7.4-1).
  *
  * Streaming maintenance (the per-batch O(|Δ|) discipline): `Prepared` can
  * carry a signed PATCH overlay (src, dst, w ∈ {−1, +1}) over a FIXED base
  * adjacency. A superstep then sums base contributions (co-partitioned join,
  * untouched) plus w-weighted patch contributions (broadcast of the tiny
  * patch) — deleted base edges cancel exactly, added edges contribute once.
  * `updatePrepared` maintains the vertex/out-degree state by pure arithmetic
  * on the delta (never rescanning E) and compacts the patch; the stream
  * driver rebuilds the base only when the patch outgrows a threshold.
  */
final class PageRank(
    damping: Double = 0.85,
    tol: Double = 1e-6,
    maxIter: Int = 100) extends Algorithm {

  override def name: String = "pagerank"

  override def run(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                   store: Option[StateStore] = None): AlgoResult =
    loop(spark, PageRank.prepare(spark, edges, vertices), store,
      startIter = 0, startRanks = None, ownPrepared = true)

  /** Resume from the last committed superstep (north rule: a killed job
    * resumes mid-iteration from `latestCompleted`; torn snapshots without a
    * manifest are skipped by the store). */
  def resume(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
             store: StateStore): AlgoResult = {
    val last = store.latestCompleted(name)
    if (last < 0) run(spark, edges, vertices, Some(store))
    else loop(spark, PageRank.prepare(spark, edges, vertices), Some(store), last,
      Some(store.load(spark, name, last)), ownPrepared = true)
  }

  /** WARM-start on a (possibly updated) graph: previous ranks seed the
    * iteration — new vertices enter at 1/n, the vector is renormalized to
    * unit mass, dangling/outDeg are re-derived from the NEW prepared state.
    * Power iteration contracts to a unique fixpoint, so the warm run
    * converges to the same ranks as a cold run (within tol) in far fewer
    * supersteps when the update delta is small. */
  def runFrom(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
              prevRanks: DataFrame): AlgoResult =
    seeded(spark, PageRank.prepare(spark, edges, vertices), prevRanks,
      ownPrepared = true)

  /** Cold run over a caller-owned Prepared (base+patch): the streaming
    * tier's initializer. The Prepared is NOT unpersisted. */
  def runOnPrepared(spark: SparkSession, g: PageRank.Prepared): AlgoResult =
    loop(spark, g, None, startIter = 0, startRanks = None, ownPrepared = false)

  /** Warm restart over a caller-owned, incrementally-maintained Prepared —
    * the streaming per-batch path: no prepare(), no full-E shuffle, just the
    * seed normalization plus the usual one-shuffle supersteps. */
  def runFromPrepared(spark: SparkSession, g: PageRank.Prepared,
                      prevRanks: DataFrame): AlgoResult =
    seeded(spark, g, prevRanks, ownPrepared = false)

  private def seeded(spark: SparkSession, g: PageRank.Prepared,
                     prevRanks: DataFrame, ownPrepared: Boolean): AlgoResult = {
    val joined = g.verts.select(col("id"))
      .join(prevRanks.select(col("id"), col("rank")), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("rank"), lit(1.0 / g.n)).as("rank"))
      .localCheckpoint(true)
    val total = joined.agg(sum(col("rank"))).head().getDouble(0)
    loop(spark, g, None, startIter = 0,
      startRanks = Some(joined.select(col("id"), (col("rank") / total).as("rank"))),
      ownPrepared = ownPrepared)
  }

  private def loop(spark: SparkSession, g: PageRank.Prepared,
                   store: Option[StateStore], startIter: Int,
                   startRanks: Option[DataFrame], ownPrepared: Boolean): AlgoResult = {
    val n = g.n
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    var ranks = (startRanks match {
      // seeds/snapshots carry (id, rank); dangling + outDeg come from the
      // prepared vertex state (ids are verts-exact by construction)
      case Some(df) => g.verts.select(col("id"), col("outDeg"), col("dangling"))
        .join(df.select(col("id"), col("rank")).repartition(parts, col("id"))
            .hint("shuffle_hash"),
          Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("rank"), lit(1.0 / n)).as("rank"),
          col("dangling"), col("outDeg"))
      case None => g.verts.select(col("id"), lit(1.0 / n).as("rank"),
        col("dangling"), col("outDeg"))
    }).localCheckpoint(true)
    var danglingMass = PageRank.danglingMass(ranks)

    var it = startIter
    var linf = Double.MaxValue
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    while (it < maxIter && linf >= tol) {
      val t0 = System.nanoTime()
      val stepped = PageRank.superstep(g, ranks, danglingMass, damping)
        .withColumn("d", abs(col("rank") - col("prev")))
      val next = stepped
        .select(col("id"), col("rank"), col("dangling"), col("outDeg"), col("d"))
        // LAZY: the delta-norm agg below materializes the checkpoint in the
        // same action (opt round 6 — one job per superstep, not two); prev
        // is only unpersisted after that agg has run
        .localCheckpoint(false)
      // one scan of the fresh state: delta norms + next dangling mass
      val row = next.agg(
        sum(col("d")).as("l1"), max(col("d")).as("linf"),
        sum(when(col("dangling"), col("rank")).otherwise(0.0)).as("dm")).head()
      val l1 = row.getDouble(0)
      linf = row.getDouble(1)
      danglingMass = row.getDouble(2)
      val wallMs = (System.nanoTime() - t0) / 1000000L

      it += 1
      val m = SuperstepMetrics(it, wallMs, n.toLong, l1, linf, 0L)
      metrics += m
      val prev = ranks
      store.foreach(_.commit(spark, name, it,
        next.select("id", "rank", "dangling"), l1, linf, 0L, wallMs))
      ranks = next.select("id", "rank", "dangling", "outDeg")
      prev.unpersist()
    }

    if (ownPrepared) { g.adj.unpersist(); g.verts.unpersist() }
    AlgoResult(ranks.select("id", "rank"), it, metrics.toSeq)
  }
}

object PageRank {

  /** Prepared graph: co-partitioned, checkpointed inputs reused by every
    * superstep. `adj` is degree-free (src, dst, salt); `verts` carries
    * (id, outDeg, dangling). `hotIds` is Some(tiny table of hub ids) iff
    * some vertex's out-degree exceeds the skew threshold — then `adj`
    * carries a real `salt` and the contribution join runs salted (see
    * superstep). `patch` is the streaming tier's signed delta overlay. */
  final case class Prepared(adj: DataFrame, verts: DataFrame, n: Double,
                            hotIds: Option[DataFrame] = None, saltK: Int = 16,
                            patch: Option[DataFrame] = None)

  /** Hub skew handling (north rule): a vertex with out-degree >
    * `hotDegThreshold` concentrates that many rows on one `src` shuffle key
    * in the per-superstep contribution join. Detected ONCE here (degree is
    * static): such adj rows get a deterministic salt from xxhash64(dst), and
    * every superstep broadcast-replicates the hubs' rank rows per salt —
    * bounded per-key rows, one tiny broadcast, no change when no hubs exist
    * (web out-degree is usually moderate; transposed/social graphs are the
    * hub case). */
  def prepare(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
              hotDegThreshold: Long = 2000000L, saltK: Int = 16): Prepared = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDeg"))
      .localCheckpoint(true)
    val hot = outDeg.where(col("outDeg") > hotDegThreshold).select(col("id"))
    val hasHot = hot.limit(1).count() > 0
    val adjBase =
      if (hasHot)
        edges.select(col("src"), col("dst"))
          .join(broadcast(hot.withColumn("isHot", lit(true)))
              .withColumnRenamed("id", "src"), Seq("src"), "left_outer")
          .select(col("src"), col("dst"),
            when(col("isHot"),
              pmod(xxhash64(col("dst")), lit(saltK.toLong))).otherwise(lit(0L)).as("salt"))
      else edges.select(col("src"), col("dst"), lit(0L).as("salt"))
    val adj = (if (hasHot) adjBase.repartition(parts, col("src"), col("salt"))
               else adjBase.repartition(parts, col("src")))
      .localCheckpoint(true)
    val verts = vertices.select(col("id")).distinct()
      .join(outDeg.hint("shuffle_hash"), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("outDeg"), lit(0L)).as("outDeg"),
        col("outDeg").isNull.as("dangling"))
      .repartition(parts, col("id"))
      .localCheckpoint(true)
    val n = verts.count().toDouble
    require(n > 0, "empty vertex set")
    Prepared(adj, verts, n,
      if (hasHot) Some(hot.localCheckpoint(true)) else None, saltK)
  }

  /** Incremental Prepared maintenance for the streaming tier — O(|Δ|)
    * compute, ZERO scans or shuffles of the edge table:
    *  - vertex/out-degree state updated by pure arithmetic on the per-src
    *    delta counts (broadcast join against the old verts);
    *  - the base adjacency is reused UNCHANGED; the delta folds into the
    *    signed patch (w = +1 add, −1 delete), compacted so weights stay in
    *    {−1, +1} (a delete of a base edge later re-added nets to 0, etc).
    * `addedEdges`/`deletedEdges` are DIRECTED (src, dst) deltas
    * (Updates.edgeDeltaDirected); vertex membership changes come as tiny
    * driver-side id lists. The caller rebuilds via prepare() when the patch
    * outgrows its threshold (StreamGraph does this). */
  def updatePrepared(spark: SparkSession, prev: Prepared,
                     addedEdges: DataFrame, deletedEdges: DataFrame,
                     newVertexIds: Seq[Long] = Seq.empty,
                     deletedVertexIds: Seq[Long] = Seq.empty): Prepared = {
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val dd = addedEdges.select(col("src").as("id"), lit(1L).as("d"))
      .unionByName(deletedEdges.select(col("src").as("id"), lit(-1L).as("d")))
      .groupBy(col("id")).agg(sum(col("d")).as("dd"))
      .localCheckpoint(true)
    val survivors =
      if (deletedVertexIds.isEmpty) prev.verts
      else prev.verts.where(!col("id").isin(deletedVertexIds: _*))
    val updated = survivors
      .join(broadcast(dd), Seq("id"), "left_outer")
      .select(col("id"), (col("outDeg") + coalesce(col("dd"), lit(0L))).as("outDeg"))
    val fresh = newVertexIds.toDF("id")
      .join(dd, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("dd"), lit(0L)).as("outDeg"))
    val verts = updated.unionByName(fresh)
      .select(col("id"), col("outDeg"), (col("outDeg") === 0L).as("dangling"))
      .repartition(parts, col("id"))
      .localCheckpoint(true)
    val deltas = addedEdges.select(col("src"), col("dst"), lit(1L).as("w"))
      .unionByName(deletedEdges.select(col("src"), col("dst"), lit(-1L).as("w")))
    val patch = prev.patch.map(_.unionByName(deltas)).getOrElse(deltas)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .where(col("w") =!= 0L)
      .localCheckpoint(true)
    prev.copy(verts = verts, n = verts.count().toDouble, patch = Some(patch))
  }

  def danglingMass(ranks: DataFrame): Double =
    ranks.agg(sum(when(col("dangling"), col("rank")).otherwise(0.0))).head().getDouble(0)

  /** One superstep: returns (id, rank, prev, dangling, outDeg) — NOT yet
    * materialized. Exactly one shuffle (the groupBy(dst) sum).
    *
    * Join-shape constraint (hard-won): the state chain must pass through a
    * LEFT OUTER join, never an inner one. Catalyst's size-only stats
    * visitor estimates inner-join size as the PRODUCT of the children and
    * `localCheckpoint` preserves origin stats across the lineage cut — an
    * inner join of state with itself squares the BigInt sizeInBytes every
    * superstep, and by iteration ~20 the driver spends seconds per plan in
    * BigInteger.multiply inside stats estimation. With state as the left
    * side of one left-outer join (size = sum, not product), the estimate
    * grows only linearly in the exponent. */
  def superstep(g: Prepared, ranks: DataFrame, danglingMass: Double,
                damping: Double): DataFrame = {
    val n = g.n
    // r(u)/outDeg(u) computed ONCE per vertex on the rank side; a vertex
    // whose degree dropped to 0 contributes 0 here and its mass flows
    // through the dangling term instead (also keeps base/patch cancellation
    // exact: both sides of a deleted edge use the identical 0)
    val rod = ranks.select(col("id"),
      when(col("outDeg") > 0, col("rank") / col("outDeg")).otherwise(lit(0.0)).as("rod"))
    val joined = g.hotIds match {
      case None =>
        // hub-free: keep the join key = src alone so adj's one-time
        // repartition(src) still satisfies it (no per-superstep exchange)
        g.adj.join(rod.hint("shuffle_hash"), g.adj("src") === rod("id"))
      case Some(hot) =>
        // broadcast the hot-vertex frontier: hub rank rows replicated per
        // salt, join key (src, salt) matches adj's (src, salt) partitioning
        val rHot = rod.join(broadcast(hot), Seq("id"), "left_semi")
          .withColumn("rsalt", explode(array((0 until g.saltK).map(s => lit(s.toLong)): _*)))
        val rCold = rod.join(broadcast(hot), Seq("id"), "left_anti")
          .withColumn("rsalt", lit(0L))
        val rankSide = rCold.unionByName(rHot)
        g.adj.join(rankSide.hint("shuffle_hash"),
          g.adj("src") === rankSide("id") && g.adj("salt") === rankSide("rsalt"))
    }
    val baseContrib = joined.select(col("dst"), col("rod"))
    val allContrib = g.patch match {
      case Some(p) =>
        // tiny signed overlay: broadcast the patch against the rank side —
        // w = +1 adds an edge's contribution, −1 cancels a base row's
        baseContrib.unionByName(
          rod.join(broadcast(p), rod("id") === p("src"))
            .select(p("dst").as("dst"), (col("w") * col("rod")).as("rod")))
      case None => baseContrib
    }
    val contribs = allContrib
      .groupBy(col("dst").as("id"))
      .agg(sum(col("rod")).as("contrib"))
    ranks.select(col("id"), col("rank").as("prev"), col("dangling"), col("outDeg"))
      .join(contribs.hint("shuffle_hash"), Seq("id"), "left_outer")
      .select(col("id"),
        (lit((1.0 - damping) / n) +
          lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
            lit(danglingMass / n))).as("rank"),
        col("prev"), col("dangling"), col("outDeg"))
  }

  /** Fixed-iteration variant used by the DuckDB-oracle query: the oracle SQL
    * unrolls the identical recurrence k times (floating convergence loops
    * can't cross engines; a fixed iteration count can, with rounding). */
  def fixedIterations(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                      iters: Int, damping: Double = 0.85): DataFrame = {
    val g = prepare(spark, edges, vertices)
    var ranks = g.verts.select(col("id"), lit(1.0 / g.n).as("rank"),
      col("dangling"), col("outDeg")).localCheckpoint(true)
    var dm = danglingMass(ranks)
    for (i <- 1 to iters) {
      // LAZY checkpoint: the danglingMass agg materializes it in one action
      // (opt round 6). The LAST iteration stays EAGER — no agg follows it,
      // and prev.unpersist() below would otherwise drop blocks a still-lazy
      // plan needs (a truncated-lineage checkpoint cannot recompute).
      val next = superstep(g, ranks, dm, damping)
        .select("id", "rank", "dangling", "outDeg").localCheckpoint(i == iters)
      val prev = ranks
      ranks = next
      if (i < iters) dm = danglingMass(ranks)
      prev.unpersist()
    }
    g.adj.unpersist(); g.verts.unpersist()
    ranks.select("id", "rank")
  }
}
