package graft.matching

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (delta-join) triangle count maintenance — J3/J4: the
  * reference maintains match counts under edge adds/deletes by joining the
  * DELTA edge against the graph instead of recomputing
  * (Graphflow::AddEdge positive results, ParaCOSM/CSM/matching/GraphFlow/
  * graphflow.cpp:289-355; RemoveEdge negative results, :357-416).
  *
  * Batched delta with exact once-per-triangle counting: the reference
  * processes one update at a time, so a new triangle trivially contains
  * exactly one new edge; a BATCH of delta edges can form triangles with 2-3
  * delta edges, which naive per-edge seeding would double count. We assign
  * every delta edge a distinct finite rank (non-delta edges rank = +inf) and
  * charge each triangle to its MINIMUM-rank delta edge: seed from each delta
  * edge (a,b), close the wedge through both incident edges, and require both
  * other edges' ranks to be strictly larger. Each new/dead triangle is then
  * counted exactly once, and the join has the scale-right shape
  * |Δ| ⋈ E ⋈ E (delta-seeded, never a full re-enumeration).
  *
  * positive = trianglesTouching(E_after_adds, Δadd)
  * negative = trianglesTouching(E_before_deletes, Δdel)
  * newCount = oldCount + positive − negative (G2's counters).
  */
object DeltaTriangles {

  /** Count triangles of `edges` (undirected, canonical or not) that contain
    * at least one edge of `delta`, each counted once. Both inputs are
    * (src,dst) pairs; delta must be a subset of edges. */
  def trianglesTouching(spark: SparkSession, edges: DataFrame, delta: DataFrame): DataFrame = {
    // canonical undirected edge key (lo,hi); ranks only for delta edges
    def canon(df: DataFrame): DataFrame = df.select(
      least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .where(col("lo") =!= col("hi")).distinct()

    val e = canon(edges).persist()
    val d = canon(delta)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("lo"), col("hi"))).cast("long"))
    // ranked relation, both directions: rank = +inf (Long.MaxValue) if not delta
    val ranked = e.join(d, Seq("lo", "hi"), "left_outer")
      .withColumn("rank", coalesce(col("rank"), lit(Long.MaxValue)))
    val rel = ranked.select(col("lo").as("src"), col("hi").as("dst"), col("rank"))
      .union(ranked.select(col("hi").as("src"), col("lo").as("dst"), col("rank")))
      .persist()
    rel.count()

    // seed = delta edge (a,b) with rank r (one canonical orientation);
    // close through c adjacent to BOTH a and b with strictly larger ranks —
    // ties impossible (ranks are distinct; +inf only on non-delta edges,
    // and a delta edge never compares against itself here)
    val seed = rel.where(col("rank") =!= Long.MaxValue)
      .where(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"), col("rank").as("r0"))
    val viaA = rel.select(col("src").as("a"), col("dst").as("c"), col("rank").as("r1"))
    val viaB = rel.select(col("src").as("b2"), col("dst").as("c2"), col("rank").as("r2"))
    val tri = seed
      .join(viaA, Seq("a"))
      .where(col("c") =!= col("b") && col("r1") > col("r0"))
      .join(viaB, col("b") === col("b2") && col("c") === col("c2"))
      .where(col("r2") > col("r0"))
    val out = tri.agg(count(lit(1)).as("touching"))
    out
  }

  /** Full maintenance step: from `base` edges apply `adds` then `dels`
    * (disjoint sets), return one row
    * (t_old, positive, negative, t_new = t_old + pos − neg). */
  def maintain(spark: SparkSession, base: DataFrame, adds: DataFrame,
               dels: DataFrame): DataFrame = {
    import graft.algo.TriangleCount
    val afterAdds = base.select(col("src"), col("dst"))
      .union(adds.select(col("src"), col("dst"))).dropDuplicates("src", "dst")
      .localCheckpoint(true)
    val tOld = TriangleCount.countTriangles(spark, base).head().getLong(0)
    val pos = trianglesTouching(spark, afterAdds, adds).head().getLong(0)
    val neg = trianglesTouching(spark, afterAdds, dels).head().getLong(0)
    val spark2 = spark
    import spark2.implicits._
    Seq((tOld, pos, neg, tOld + pos - neg))
      .toDF("t_old", "positive", "negative", "t_new")
  }
}
