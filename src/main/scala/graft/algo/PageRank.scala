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
  * Scale notes (what survives 1000 executors × 100 TB):
  *  - `adj` (edges ⋈ outDeg) is computed ONCE and persisted — the only
  *    per-iteration shuffle is the groupBy(dst) partial+final sum, which is
  *    algebraic, so power-law hub in-degree is absorbed by map-side partial
  *    aggregation (the reference's thread-local-counter + reduce pattern,
  *    ParaCOSM parallel_graphflow.cpp:988-990, is Spark's default physical agg).
  *  - dangling ids are precomputed once; per-iteration dangling mass is one
  *    semi-join + scalar agg.
  *  - lineage is truncated every superstep (StateStore commit or
  *    localCheckpoint) — mandatory for iterative Catalyst plans
  *    (SURVEY.md §7.4-1).
  *  - AQE handles skewed join sides at runtime; the hub-heavy groupBy(dst)
  *    never skews because `sum` is algebraic (partial agg on the map side).
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

  private def loop(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                   store: Option[StateStore], startIter: Int,
                   startRanks: Option[DataFrame]): AlgoResult = {
    val verts = vertices.select(col("id")).distinct().persist()
    val n = verts.count().toDouble
    require(n > 0, "empty vertex set")

    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDeg"))
    val adj = edges.join(outDeg, edges("src") === outDeg("id"))
      .select(col("src"), col("dst"), col("outDeg")).persist()
    adj.count()
    val danglingIds = verts.join(outDeg, Seq("id"), "left_anti").persist()
    danglingIds.count()

    var ranks = startRanks.getOrElse(verts.withColumn("rank", lit(1.0 / n))).persist()
    var it = startIter
    var linf = Double.MaxValue
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    while (it < maxIter && linf >= tol) {
      val t0 = System.nanoTime()
      val (newRanks, normRow) = superstep(adj, danglingIds, verts, ranks, n)
      linf = normRow._2
      val wallMs = (System.nanoTime() - t0) / 1000000L
      it += 1
      val m = SuperstepMetrics(it, wallMs, n.toLong, normRow._1, linf, 0L)
      metrics += m
      val prev = ranks
      ranks = Algorithm.truncate(spark, newRanks, store, name, it, m).persist()
      prev.unpersist()
    }

    adj.unpersist(); danglingIds.unpersist(); verts.unpersist()
    AlgoResult(ranks, it, metrics.toSeq)
  }

  /** One superstep; returns (newRanks, (deltaL1, deltaLinf)). */
  private def superstep(adj: DataFrame, danglingIds: DataFrame, verts: DataFrame,
                        ranks: DataFrame, n: Double): (DataFrame, (Double, Double)) = {
    val danglingMass = ranks.join(danglingIds, Seq("id"), "left_semi")
      .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)

    val contribs = adj.join(ranks, adj("src") === ranks("id"))
      .groupBy(col("dst").as("id"))
      .agg(sum(col("rank") / col("outDeg")).as("contrib"))

    val newRanks = verts.join(contribs, Seq("id"), "left_outer")
      .select(col("id"),
        (lit((1.0 - damping) / n) +
          lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
            lit(danglingMass / n))).as("rank"))

    val row = newRanks.as("n").join(ranks.as("p"), Seq("id"))
      .select((col("n.rank") - col("p.rank")).as("d"))
      .agg(sum(abs(col("d"))).as("l1"), max(abs(col("d"))).as("linf")).head()
    (newRanks, (row.getDouble(0), row.getDouble(1)))
  }
}

object PageRank {
  /** Fixed-iteration variant used by the DuckDB-oracle query: the oracle SQL
    * unrolls the identical recurrence k times (floating convergence loops
    * can't cross engines; a fixed iteration count can, with rounding). */
  def fixedIterations(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                      iters: Int, damping: Double = 0.85): DataFrame = {
    val verts = vertices.select(col("id")).distinct().persist()
    val n = verts.count().toDouble
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDeg"))
    val adj = edges.join(outDeg, edges("src") === outDeg("id"))
      .select(col("src"), col("dst"), col("outDeg")).persist()
    val danglingIds = verts.join(outDeg, Seq("id"), "left_anti").persist()

    var ranks = verts.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val danglingMass = ranks.join(danglingIds, Seq("id"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = adj.join(ranks, adj("src") === ranks("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outDeg")).as("contrib"))
      ranks = verts.join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              lit(danglingMass / n))).as("rank"))
        .localCheckpoint(true)
    }
    adj.unpersist(); danglingIds.unpersist(); verts.unpersist()
    ranks
  }
}
