package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Oracles, SparkSpec}
import graft.graph.GraphBuilder
import graft.pages.PagesFixture

/** Algorithm correctness vs plain-Scala oracles on the deterministic pages
  * fixture (FIXTURES.md §6.3-6.5) plus the golden micro-fixtures (§5). */
class AlgoSpec extends SparkSpec {

  private val S = 6
  private val P = 15

  private lazy val fixture: (Seq[Long], Seq[(Long, Long)], DataFrame, DataFrame) = {
    import spark.implicits._
    val pages = spark.createDataset(PagesFixture.generate(S, P))
    val (vertices, edges) = GraphBuilder.buildVerified(spark, pages)
    val vDF = vertices.toDF().localCheckpoint(true)
    val eDF = edges.toDF().localCheckpoint(true)
    val vIds = vDF.select("id").as[Long].collect().toSeq
    val eIds = eDF.select("src", "dst").as[(Long, Long)].collect().toSeq
    (vIds, eIds, vDF, eDF)
  }

  // ------------------------------------------------------------- PageRank

  test("PageRank matches plain-Scala power iteration within 1e-6") {
    val (vIds, eIds, vDF, eDF) = fixture
    // step-delta tol must be tighter than the comparison tol: stopping at
    // L∞(step) < ε leaves up to ε·d/(1-d) ≈ 5.7ε to the true fixpoint
    val want = Oracles.pageRank(vIds, eIds, tol = 1e-12, maxIter = 500)
    val res = new PageRank(tol = 1e-8, maxIter = 500).run(spark, eDF, vDF)
    assert(res.iterations > 3 && res.iterations < 500)
    val got = res.state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == vIds.size)
    vIds.foreach { v =>
      assert(math.abs(got(v) - want(v)) < 1e-6, s"rank($v)")
    }
  }

  test("PageRank mass conservation (dangling redistribution keeps Σr = 1)") {
    val (_, _, vDF, eDF) = fixture
    val res = new PageRank(tol = 1e-6).run(spark, eDF, vDF)
    val mass = res.state.agg(sum("rank")).head().getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9)
    // fixture guarantees exactly one dangling page — its mass must flow
    assert(res.metrics.nonEmpty && res.metrics.last.deltaLinf < 1e-6)
  }

  test("PageRank deterministic across shuffle-partition settings (within 1e-6)") {
    val (_, _, vDF, eDF) = fixture
    def runWith(parts: String): Map[Long, Double] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try new PageRank(tol = 1e-6).run(spark, eDF, vDF)
        .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val a = runWith("2")
    val b = runWith("16")
    a.keys.foreach(v => assert(math.abs(a(v) - b(v)) < 1e-6))
  }

  // ------------------------------------------------- Connected components

  test("CC labels exactly match BFS oracle; component count = ceil(S/2)") {
    val (vIds, eIds, vDF, eDF) = fixture
    val want = Oracles.components(vIds, eIds)
    val res = new ConnectedComponents(maxIter = 50).run(spark, eDF, vDF)
    val got = res.state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // bridge rule pairs sites (0,1),(2,3),(4,5) → S/2 components for even S
    assert(got.values.toSet.size == (S + 1) / 2)
  }

  test("CC pointer jumping converges in far fewer supersteps than the diameter") {
    val (_, _, vDF, eDF) = fixture
    val res = new ConnectedComponents(maxIter = 50).run(spark, eDF, vDF)
    // per-site ring diameter is P/2 ≥ 7; two bridged rings ~ P; log2(2P)≈5
    assert(res.iterations <= 10, s"took ${res.iterations} supersteps")
  }

  test("CC on golden micro-fixtures (triangle, two 3-chains)") {
    import spark.implicits._
    // triangle.graph: 1 component
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst")
    val triV = Seq(0L, 1L, 2L).toDF("id")
    val r1 = new ConnectedComponents().run(spark, tri, triV)
    assert(r1.state.select("label").distinct().count() == 1)
    // two_components.graph: labels {0, 3}
    val two = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val twoV = (0L to 5L).toDF("id")
    val r2 = new ConnectedComponents().run(spark, two, twoV)
    val labels = r2.state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  // ------------------------------------------------------ Label propagation

  test("LP single step matches plain-Scala oracle") {
    val (vIds, eIds, vDF, eDF) = fixture
    val und = GraphBuilder.undirected(eDF)
    val state0 = vDF.select(col("id")).withColumn("label", col("id"))
    val got = new LabelPropagation().step(und, state0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = Oracles.lpStep(vIds.map(v => v -> v).toMap, eIds)
    assert(got == want)
  }

  test("LP deterministic across runs and partition settings") {
    val (_, _, vDF, eDF) = fixture
    def run(parts: String): Map[Long, Long] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try new LabelPropagation(maxIter = 5).run(spark, eDF, vDF)
        .state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(run("2") == run("16"))
  }

  // --------------------------------------------------------- Triangle count

  test("triangle count matches brute force on the fixture") {
    val (_, eIds, _, eDF) = fixture
    val want = Oracles.triangles(eIds)
    assert(want > 0, "fixture must contain triangles (k%7 seeds)")
    val got = TriangleCount.countTriangles(spark, eDF).head().getLong(0)
    assert(got == want)
  }

  test("triangle count on golden micro-fixtures") {
    import spark.implicits._
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst")
    assert(TriangleCount.countTriangles(spark, tri).head().getLong(0) == 1L)
    val chains = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(TriangleCount.countTriangles(spark, chains).head().getLong(0) == 0L)
    // star5: hub with 5 spokes, no closures
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    assert(TriangleCount.countTriangles(spark, star).head().getLong(0) == 0L)
  }

  test("triangle count invariant under edge direction (orientation is internal)") {
    import spark.implicits._
    val e = Seq((0L, 1L), (2L, 1L), (0L, 2L), (2L, 3L)).toDF("src", "dst") // same triangle, mixed dirs
    assert(TriangleCount.countTriangles(spark, e).head().getLong(0) == 1L)
  }

  // ----------------------------------------------- permutation invariance

  test("vertex-id permutation invariance (CC component sizes, triangles, PR multiset)") {
    import spark.implicits._
    val (vIds, eIds, vDF, eDF) = fixture
    // permute ids by a fixed bijection
    val perm = vIds.sorted.zip(new scala.util.Random(7).shuffle(vIds.sorted)).toMap
    val pV = vIds.map(perm).toDF("id")
    val pE = eIds.map { case (a, b) => (perm(a), perm(b)) }.toDF("src", "dst")

    val t0 = TriangleCount.countTriangles(spark, eDF).head().getLong(0)
    val t1 = TriangleCount.countTriangles(spark, pE).head().getLong(0)
    assert(t0 == t1)

    val s0 = new ConnectedComponents().run(spark, eDF, vDF)
      .state.groupBy("label").count().select("count").as[Long].collect().sorted.toSeq
    val s1 = new ConnectedComponents().run(spark, pE, pV)
      .state.groupBy("label").count().select("count").as[Long].collect().sorted.toSeq
    assert(s0 == s1)
  }
}
