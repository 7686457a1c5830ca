package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Triangle counting — the Q = C₃ instance of the reference's continuous
  * subgraph matching (SURVEY.md §2.4-J1: all CSM enumeration is an n-way
  * self-join of the edge table ordered by selectivity; the 3-cycle unrolls
  * to a 2-path join + a closing semi-join).
  *
  * Degree orientation (the selectivity ordering of ParaCOSM's
  * Graphflow::GenerateMatchingOrder, graphflow.cpp:36-137, specialized to
  * the triangle): orient every undirected edge from the (degree, id)-smaller
  * endpoint to the larger. Each triangle then appears EXACTLY once as
  * a→b→c with a<b<c in the orientation order, and — the scale property —
  * every vertex's oriented out-degree is O(√|E|), so the wedge join
  * (the only expensive shuffle) is bounded even on power-law hubs: a hub
  * with in-degree 10⁶ contributes no wedges unless its ORIENTED out-degree
  * is large, which degree ordering prevents.
  *
  * Count-only late materialization (reference CaLiG shell counting,
  * calig.cpp:495-514): we never materialize triangle rows beyond the wedge
  * semi-join — the final action is an aggregate.
  */
object TriangleCount {

  /** Canonically-oriented edge set: src precedes dst in (degree, id) order.
    * `und` is materialized (localCheckpoint, GC-cleaned — a bare persist
    * would live in the session CacheManager forever, a leak on streaming
    * callers) — the degree pass and the orientation join both read it, and
    * upstream `edges` is often an expensive derivation (re-running it 3x
    * dominated q_triangles' round-1 cost). */
  def orient(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .localCheckpoint(true)
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    withDeg
      .where(col("sdeg") < col("ddeg") ||
        (col("sdeg") === col("ddeg") && col("src") < col("dst")))
      .select(col("src"), col("dst"))
  }

  /** Total triangle count (scalar DataFrame with one column `triangles`). */
  def countTriangles(spark: SparkSession, edges: DataFrame): DataFrame = {
    val o = orient(edges).localCheckpoint(true)
    val e1 = o.as("e1")
    val e2 = o.as("e2")
    val wedges = e1.join(e2, col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val closed = wedges.join(o.as("e3"),
      col("a") === col("e3.src") && col("c") === col("e3.dst"), "left_semi")
    val res = closed.agg(count(lit(1)).as("triangles"))
    res
  }

  /** Per-vertex triangle participation counts (id, triangles) — every vertex
    * of each oriented triangle a→b→c gets +1. */
  def perVertex(spark: SparkSession, edges: DataFrame): DataFrame = {
    val o = orient(edges).localCheckpoint(true)
    val e1 = o.as("e1")
    val e2 = o.as("e2")
    val tris = e1.join(e2, col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      .join(o.as("e3"),
        col("a") === col("e3.src") && col("c") === col("e3.dst"), "left_semi")
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
  }
}
