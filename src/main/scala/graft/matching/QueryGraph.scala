package graft.matching

/** Driver-side query-graph model for continuous/static subgraph matching —
  * the reference's core input (ParaCOSM/CSM/graph/graph.h:63-100 for the
  * labeled graph; query graphs are loaded the same way and are tiny, 3-25
  * vertices). Query graphs live on the driver: ordering decisions over them
  * are pure Scala; only the DATA graph is distributed.
  *
  * Vertices are named; `vlabel`/`elabel` of None means unconstrained
  * (wildcard) — the reference has no wildcards (every vertex/edge carries a
  * label) but they fall out naturally here and make unlabeled queries (e.g.
  * cliques) the degenerate case.
  */
final case class QVertex(name: String, vlabel: Option[Int] = None)

/** Undirected query edge between named query vertices (the reference graph
  * is undirected, graph.h:63). */
final case class QEdge(u: String, v: String, elabel: Option[Int] = None)

final case class QueryGraph(vertices: Seq[QVertex], edges: Seq[QEdge]) {
  require(vertices.map(_.name).distinct.size == vertices.size, "duplicate query vertex names")
  private val names = vertices.map(_.name).toSet
  require(edges.forall(e => names(e.u) && names(e.v) && e.u != e.v),
    "query edge endpoints must be distinct declared vertices")

  val byName: Map[String, QVertex] = vertices.map(v => v.name -> v).toMap

  def degree(name: String): Int = edges.count(e => e.u == name || e.v == name)

  /** Query edges incident to a vertex set. */
  def incident(bound: Set[String]): Seq[QEdge] =
    edges.filter(e => bound(e.u) || bound(e.v))
}

object QueryGraph {

  /** Path query u1-u2-...-uk with optional labels. */
  def path(vlabels: Seq[Option[Int]], elabels: Seq[Option[Int]]): QueryGraph = {
    require(elabels.size == vlabels.size - 1)
    val vs = vlabels.zipWithIndex.map { case (l, i) => QVertex(s"u${i + 1}", l) }
    val es = elabels.zipWithIndex.map { case (l, i) => QEdge(s"u${i + 1}", s"u${i + 2}", l) }
    QueryGraph(vs, es)
  }

  /** k-clique with one shared vertex label (None = unlabeled). */
  def clique(k: Int, vlabel: Option[Int] = None): QueryGraph = {
    val vs = (1 to k).map(i => QVertex(s"u$i", vlabel))
    val es = for { i <- 1 to k; j <- (i + 1) to k } yield QEdge(s"u$i", s"u$j", None)
    QueryGraph(vs, es)
  }

  /** The triangle — the C₃ special case TriangleCount hand-optimizes. */
  def triangle: QueryGraph = clique(3)
}
