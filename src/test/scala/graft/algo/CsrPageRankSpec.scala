package graft.algo

import org.apache.spark.sql.functions._

import graft.{Oracles, SparkSpec}
import graft.graph.GraphBuilder
import graft.pages.PagesFixture

/** Cross-implementation agreement (the reference's own oracle methodology,
  * SURVEY.md §5): the CSR-block PageRank and the Dataset-join PageRank are
  * independent implementations that must agree within 1e-6, and both must
  * match the plain-Scala power iteration. */
class CsrPageRankSpec extends SparkSpec {

  test("CSR PageRank == plain-Scala oracle == Dataset-join PageRank (1e-6)") {
    import spark.implicits._
    val pages = spark.createDataset(PagesFixture.generate(6, 15))
    val (v, e) = GraphBuilder.buildVerified(spark, pages)
    val vDF = v.toDF().localCheckpoint(true)
    val eDF = e.toDF().localCheckpoint(true)
    val vIds = vDF.select("id").as[Long].collect().toSeq
    val eIds = eDF.select("src", "dst").as[(Long, Long)].collect().toSeq

    val want = Oracles.pageRank(vIds, eIds, tol = 1e-12, maxIter = 500)
    val (rowsDF, iters, metrics) = CsrPageRank.pagerank(spark, eDF, vDF, tol = 1e-8, maxIter = 500)
    assert(iters > 3)
    assert(metrics.last.deltaLinf < 1e-8)
    val got = rowsDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == vIds.size)
    vIds.foreach(id => assert(math.abs(got(id) - want(id)) < 1e-6, s"rank($id)"))

    val dsJoin = new PageRank(tol = 1e-8, maxIter = 500).run(spark, eDF, vDF)
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vIds.foreach(id => assert(math.abs(got(id) - dsJoin(id)) < 1e-6, s"ximpl rank($id)"))
  }

  test("CSR build: blocks partition the vertex set; edge arrays aligned") {
    import spark.implicits._
    val pages = spark.createDataset(PagesFixture.generate(4, 12))
    val (v, e) = GraphBuilder.buildVerified(spark, pages)
    val blocks = CsrPageRank.build(spark, e.toDF(), v.toDF())
    val nVerts = blocks.vertsOrFail.collect().map(_.ids.length).sum
    assert(nVerts == v.count())
    val nEdges = blocks.graph.collect().map(_.edgeSrcIdx.length.toLong).sum
    assert(nEdges == e.count())
    // every block's ids sorted & unique (dense index contract)
    blocks.vertsOrFail.collect().foreach { vb =>
      assert(vb.ids.toSeq == vb.ids.toSeq.sorted.distinct)
    }
    // mass of init state = 1
    val mass = blocks.init.collect().map(_.ranks.sum).sum
    assert(math.abs(mass - 1.0) < 1e-9)
  }

  test("CSR PageRank on the star5 golden fixture (hub mass, closed form)") {
    import spark.implicits._
    // hub 0 with spokes 1..5 (directed spokes → hub); hub dangles
    val e = (1L to 5L).map(i => (i, 0L)).toDF("src", "dst")
    val v = (0L to 5L).toDF("id")
    val (rows, _, _) = CsrPageRank.pagerank(spark, e, v, tol = 1e-10, maxIter = 300)
    val got = rows.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Oracles.pageRank(0L to 5L, (1L to 5L).map(i => (i, 0L)), tol = 1e-12, maxIter = 500)
    (0L to 5L).foreach(i => assert(math.abs(got(i) - want(i)) < 1e-6))
    assert(got(0L) > got(1L) * 3, "hub must concentrate rank")
  }

  test("auto router: small graphs take the row-join plan, results identical") {
    import spark.implicits._
    val pages = spark.createDataset(PagesFixture.generate(5, 12))
    val (v, e) = GraphBuilder.buildVerified(spark, pages)
    val vDF = v.toDF().localCheckpoint(true)
    val eDF = e.toDF().localCheckpoint(true)
    // below the threshold: routes to the Dataset-join plan
    val (small, _, _) = CsrPageRank.auto(spark, eDF, vDF, tol = 1e-8, maxIter = 200)
    // forced CSR (threshold 0): same ranks within 1e-6
    val (csr, _, _) = CsrPageRank.auto(spark, eDF, vDF, tol = 1e-8, maxIter = 200,
      csrThreshold = 0L)
    val a = small.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = csr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, r) => assert(math.abs(r - b(id)) < 1e-6, s"auto rank($id)") }
  }

  test("packed RDD loop == Dataset loop == oracle (the scaling kernel)") {
    import spark.implicits._
    val pages = spark.createDataset(PagesFixture.generate(6, 15))
    val (v, e) = GraphBuilder.buildVerified(spark, pages)
    val vDF = v.toDF().localCheckpoint(true)
    val eDF = e.toDF().localCheckpoint(true)
    val blocks = CsrPageRank.build(spark, eDF, vDF)
    val (dsState, itersDs, _) = CsrPageRank.run(spark, blocks, tol = 1e-8, maxIter = 300)
    val (rddState, itersRdd, m) = CsrPageRank.runPacked(spark, blocks, tol = 1e-8, maxIter = 300)
    assert(itersDs == itersRdd, s"loop iteration counts differ: $itersDs vs $itersRdd")
    assert(m.last.deltaLinf < 1e-8)
    val a = CsrPageRank.toRows(spark, dsState, blocks.vertsOrFail)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = CsrPageRank.toRows(spark, rddState, blocks.vertsOrFail)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, r) => assert(r == b(id), s"packed-loop rank($id) differs") }
  }
}
