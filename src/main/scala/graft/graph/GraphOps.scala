package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point/scan access operators (reference §2.3): GetNeighbors /
  * GetNeighborLabels (graph.cpp:123-131), GetVertexLabel (:118-121),
  * GetEdgeLabel (:133-174), NumVertices/NumEdges/NumVLabels/NumELabels
  * (graph.h:80-83). The reference serves these as O(1)/O(deg) pointer
  * lookups; tabular engines serve them as filters/joins — cheap ONLY when
  * used set-at-a-time. Single-id convenience forms exist for parity and
  * tests; production paths should use the set-oriented forms (a filter
  * pushed to the scan, or a broadcast semi-join).
  *
  * Tables: edges (src, dst, elabel?), vertices (id, vlabel?). Edges are
  * undirected (graph.h:63) — neighbor scans look both ways.
  */
object GraphOps {

  /** Neighbor set of one vertex (set-oriented: filter → union). */
  def neighbors(edges: DataFrame, id: Long): DataFrame =
    edges.where(col("src") === id).select(col("dst").as("nbr"))
      .union(edges.where(col("dst") === id).select(col("src").as("nbr")))
      .distinct()

  /** Neighbors with vertex labels (GetNeighborLabels). */
  def neighborLabels(edges: DataFrame, vertices: DataFrame, id: Long): DataFrame =
    neighbors(edges, id)
      .join(vertices.select(col("id").as("nbr"), col("vlabel")), Seq("nbr"))

  /** Batch adjacency: one row per (id, neighbor) for a whole id set —
    * the shape to use at scale (broadcast semi-join, not N point scans). */
  def neighborsOf(edges: DataFrame, ids: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    und.join(broadcast(ids.select(col("id").as("src"))), Seq("src"), "left_semi")
      .select(col("src").as("id"), col("dst").as("nbr")).distinct()
  }

  /** Vertex label point lookup (GetVertexLabel); None if absent. */
  def vertexLabel(vertices: DataFrame, id: Long): Option[Int] =
    vertices.where(col("id") === id).select(col("vlabel"))
      .collect().headOption.map(_.getInt(0))

  /** Edge label lookup (GetEdgeLabel): Some((srcLabel, dstLabel, eLabel)) if
    * the undirected edge exists, like the reference's (vlabel,vlabel,elabel)
    * triple / -1 contract. */
  def edgeLabel(edges: DataFrame, vertices: DataFrame,
                v1: Long, v2: Long): Option[(Int, Int, Int)] = {
    val e = edges.where(
      (col("src") === v1 && col("dst") === v2) ||
        (col("src") === v2 && col("dst") === v1))
      .select(col("elabel")).collect().headOption.map(_.getInt(0))
    e.flatMap { el =>
      for {
        l1 <- vertexLabel(vertices, v1)
        l2 <- vertexLabel(vertices, v2)
      } yield (l1, l2, el)
    }
  }

  /** Metadata aggregates (NumVertices/NumEdges/NumVLabels/NumELabels) in ONE
    * pass per table. */
  def metadata(edges: DataFrame, vertices: DataFrame): (Long, Long, Long, Long) = {
    val v = vertices.agg(count(lit(1)).as("nv"),
      countDistinct(col("vlabel")).as("nvl")).head()
    val e = edges.agg(count(lit(1)).as("ne"),
      countDistinct(col("elabel")).as("nel")).head()
    (v.getLong(0), e.getLong(0), v.getLong(1), e.getLong(1))
  }
}
