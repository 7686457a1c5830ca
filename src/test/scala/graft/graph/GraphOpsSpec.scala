package graft.graph

import graft.SparkSpec

/** Access-operator parity (A1-A4, A6) on a hand graph. */
class GraphOpsSpec extends SparkSpec {

  private lazy val (eDF, vDF) = {
    import spark.implicits._
    // labeled square 1-2-3-4-1 with a diagonal 1-3
    val e = Seq((1L, 2L, 0), (2L, 3L, 1), (3L, 4L, 0), (4L, 1L, 1), (1L, 3L, 2))
      .toDF("src", "dst", "elabel")
    val v = Seq((1L, 10), (2L, 20), (3L, 10), (4L, 20)).toDF("id", "vlabel")
    (e, v)
  }

  test("neighbors / neighborLabels / batch adjacency") {
    import spark.implicits._
    assert(GraphOps.neighbors(eDF, 1L).as[Long].collect().toSet == Set(2L, 3L, 4L))
    assert(GraphOps.neighborLabels(eDF, vDF, 2L).as[(Long, Int)].collect().toSet
      == Set((1L, 10), (3L, 10)))
    val adj = GraphOps.neighborsOf(eDF, Seq(1L, 4L).toDF("id"))
      .as[(Long, Long)].collect().toSet
    assert(adj == Set((1L, 2L), (1L, 3L), (1L, 4L), (4L, 3L), (4L, 1L)))
  }

  test("vertexLabel / edgeLabel point lookups (reference triple contract)") {
    assert(GraphOps.vertexLabel(vDF, 3L).contains(10))
    assert(GraphOps.vertexLabel(vDF, 99L).isEmpty)
    assert(GraphOps.edgeLabel(eDF, vDF, 3L, 1L).contains((10, 10, 2))) // both directions
    assert(GraphOps.edgeLabel(eDF, vDF, 2L, 4L).isEmpty) // no edge
  }

  test("metadata aggregates") {
    assert(GraphOps.metadata(eDF, vDF) == ((4L, 5L, 2L, 3L)))
  }

  test("streaming triangle maintenance: delta-join counters track recompute") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.stream.StreamGraph
    implicit val sqlCtx = spark.sqlContext
    // start: path 1-2-3-4; batch A closes two triangles; batch B deletes one
    val v0 = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val g = new StreamGraph(spark, v0, e0, maintainTriangles = true)
    assert(g.triangleCount == 0L)
    val stream = MemoryStream[graft.graph.GraphUpdate]
    stream.addData(
      GraphUpdate(1, "e", 1, 3, 0), GraphUpdate(2, "e", 2, 4, 0)) // two triangles
    val q = g.start(stream.toDS(), Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(g.triangleCount == 2L && g.trianglePositive == 2L)
    stream.addData(GraphUpdate(3, "-e", 2, 3, 0)) // kills both triangles
    val q2 = g.start(stream.toDS(), Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(g.triangleCount == 0L && g.triangleNegative == 2L)
    // matches from-scratch recount of the final state
    val scratch = graft.algo.TriangleCount.countTriangles(spark, g.edges)
      .head().getLong(0)
    assert(g.triangleCount == scratch)
  }
}
