package graft.algo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  - `adj` (src, dst, outDeg) is hash-partitioned by src ONCE and
  *    checkpointed; `localCheckpoint` preserves outputPartitioning, so the
  *    per-iteration adj ⋈ ranks join needs no exchange on the adj side.
  *  - `ranks` carries HashPartitioning(id) out of the previous groupBy/join,
  *    matching both the adj join (src=id) and the verts join (id=id).
  *  - the vertex table carries a precomputed `dangling` flag, so the next
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
  */
final class PageRank(
    damping: Double = 0.85,
    tol: Double = 1e-6,
    maxIter: Int = 100) extends Algorithm {

  override def name: String = "pagerank"

  override def run(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                   store: Option[StateStore] = None): AlgoResult =
    loop(spark, edges, vertices, store, startIter = 0, startRanks = None)

  /** Resume from the last committed superstep (north rule: a killed job
    * resumes mid-iteration from `latestCompleted`; torn snapshots without a
    * manifest are skipped by the store). */
  def resume(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
             store: StateStore): AlgoResult = {
    val last = store.latestCompleted(name)
    if (last < 0) run(spark, edges, vertices, Some(store))
    else loop(spark, edges, vertices, Some(store), last,
      Some(store.load(spark, name, last)))
  }

  /** WARM-start on a (possibly updated) graph: previous ranks seed the
    * iteration — new vertices enter at 1/n, the vector is renormalized to
    * unit mass, dangling flags are re-derived from the NEW edge set. Power
    * iteration contracts to a unique fixpoint, so the warm run converges to
    * the same ranks as a cold run (within tol) in far fewer supersteps when
    * the update delta is small — the PageRank analogue of the safe-update
    * warm path the CC maintenance already takes (Updates.incrementalCC). */
  def runFrom(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
              prevRanks: DataFrame): AlgoResult = {
    val verts = vertices.select(col("id")).distinct().localCheckpoint(true)
    val n = verts.count().toDouble
    val joined = verts
      .join(prevRanks.select(col("id"), col("rank")), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("rank"), lit(1.0 / n)).as("rank"))
      .localCheckpoint(true)
    val total = joined.agg(sum(col("rank"))).head().getDouble(0)
    val srcs = edges.select(col("src").as("id")).distinct().withColumn("live", lit(true))
    val seed = joined
      .select(col("id"), (col("rank") / total).as("rank"))
      .join(srcs, Seq("id"), "left_outer")
      .select(col("id"), col("rank"), coalesce(!col("live"), lit(true)).as("dangling"))
    loop(spark, edges, vertices, None, startIter = 0, startRanks = Some(seed))
  }

  private def loop(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                   store: Option[StateStore], startIter: Int,
                   startRanks: Option[DataFrame]): AlgoResult = {
    val g = PageRank.prepare(spark, edges, vertices)
    val n = g.n

    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    var ranks = (startRanks match {
      // snapshots carry (id, rank, dangling); re-establish co-partitioning
      case Some(df) => df.select("id", "rank", "dangling").repartition(parts, col("id"))
      case None => g.verts.select(col("id"), lit(1.0 / n).as("rank"), col("dangling"))
    }).localCheckpoint(true)
    var danglingMass = PageRank.danglingMass(ranks)

    var it = startIter
    var linf = Double.MaxValue
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    while (it < maxIter && linf >= tol) {
      val t0 = System.nanoTime()
      val stepped = PageRank.superstep(g, ranks, danglingMass, damping)
        .withColumn("d", abs(col("rank") - col("prev")))
      val next = stepped.select(col("id"), col("rank"), col("dangling"), col("d"))
        .localCheckpoint(true)
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
      ranks = store match {
        case Some(s) =>
          s.commit(spark, name, it, next.select("id", "rank", "dangling"),
            l1, linf, 0L, wallMs)
        case None => next.select("id", "rank", "dangling")
      }
      prev.unpersist()
    }

    g.adj.unpersist(); g.verts.unpersist()
    AlgoResult(ranks.select("id", "rank"), it, metrics.toSeq)
  }
}

object PageRank {

  /** Prepared graph: co-partitioned, checkpointed inputs reused by every
    * superstep. `hotIds` is Some(tiny table of hub ids) iff some vertex's
    * out-degree exceeds the skew threshold — then `adj` carries a `salt`
    * column and the contribution join runs salted (see superstep). */
  final case class Prepared(adj: DataFrame, verts: DataFrame, n: Double,
                            hotIds: Option[DataFrame] = None, saltK: Int = 16)

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
    val adjBase = edges.join(outDeg.hint("shuffle_hash"), edges("src") === outDeg("id"))
      .select(col("src"), col("dst"), col("outDeg"),
        when(col("outDeg") > hotDegThreshold,
          pmod(xxhash64(col("dst")), lit(saltK.toLong))).otherwise(lit(0L)).as("salt"))
    val adj = (if (hasHot) adjBase.repartition(parts, col("src"), col("salt"))
               else adjBase.repartition(parts, col("src")))
      .localCheckpoint(true)
    val verts = vertices.select(col("id")).distinct()
      .join(outDeg.hint("shuffle_hash"), Seq("id"), "left_outer")
      .select(col("id"), col("outDeg").isNull.as("dangling"))
      .repartition(parts, col("id"))
      .localCheckpoint(true)
    val n = verts.count().toDouble
    require(n > 0, "empty vertex set")
    Prepared(adj, verts, n,
      if (hasHot) Some(hot.localCheckpoint(true)) else None, saltK)
  }

  def danglingMass(ranks: DataFrame): Double =
    ranks.agg(sum(when(col("dangling"), col("rank")).otherwise(0.0))).head().getDouble(0)

  /** One superstep: returns (id, rank, prev, dangling) — NOT yet
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
    val joined = g.hotIds match {
      case None =>
        // hub-free: keep the join key = src alone so adj's one-time
        // repartition(src) still satisfies it (no per-superstep exchange)
        g.adj.join(ranks.select(col("id"), col("rank")).hint("shuffle_hash"),
          g.adj("src") === col("id"))
      case Some(hot) =>
        // broadcast the hot-vertex frontier: hub ranks replicated per salt,
        // join key (src, salt) matches adj's (src, salt) partitioning
        val r = ranks.select(col("id"), col("rank"))
        val rHot = r.join(broadcast(hot), Seq("id"), "left_semi")
          .withColumn("rsalt", explode(array((0 until g.saltK).map(s => lit(s.toLong)): _*)))
        val rCold = r.join(broadcast(hot), Seq("id"), "left_anti")
          .withColumn("rsalt", lit(0L))
        val rankSide = rCold.unionByName(rHot)
        g.adj.join(rankSide.hint("shuffle_hash"),
          g.adj("src") === rankSide("id") && g.adj("salt") === rankSide("rsalt"))
    }
    val contribs = joined
      .groupBy(col("dst").as("id"))
      .agg(sum(col("rank") / col("outDeg")).as("contrib"))
    ranks.select(col("id"), col("rank").as("prev"), col("dangling"))
      .join(contribs.hint("shuffle_hash"), Seq("id"), "left_outer")
      .select(col("id"),
        (lit((1.0 - damping) / n) +
          lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
            lit(danglingMass / n))).as("rank"),
        col("prev"), col("dangling"))
  }

  /** Fixed-iteration variant used by the DuckDB-oracle query: the oracle SQL
    * unrolls the identical recurrence k times (floating convergence loops
    * can't cross engines; a fixed iteration count can, with rounding). */
  def fixedIterations(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                      iters: Int, damping: Double = 0.85): DataFrame = {
    val g = prepare(spark, edges, vertices)
    var ranks = g.verts.select(col("id"), lit(1.0 / g.n).as("rank"), col("dangling"))
      .localCheckpoint(true)
    var dm = danglingMass(ranks)
    for (i <- 1 to iters) {
      val next = superstep(g, ranks, dm, damping)
        .select("id", "rank", "dangling").localCheckpoint(true)
      val prev = ranks
      ranks = next
      if (i < iters) dm = danglingMass(ranks)
      prev.unpersist()
    }
    g.adj.unpersist(); g.verts.unpersist()
    ranks.select("id", "rank")
  }
}
