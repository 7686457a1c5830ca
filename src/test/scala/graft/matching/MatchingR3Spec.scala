package graft.matching

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-3 matching features: automorphism breaking (J10 family), shell
  * combinatorial counting (J10/G6), cost-weighted ordering (X4), the
  * shared-relation candidate index and its incremental maintenance (X3). All
  * pinned against the brute-force plain-Scala matcher. */
object MatchFixtures {
  /** Brute-force injective (or homomorphic) labeled match counter. */
  def brute(q: QueryGraph, verts: Map[Long, Int],
            edges: Set[(Long, Long, Int)], homo: Boolean = false): Long = {
    val und = edges.flatMap { case (a, b, l) => Seq((a, b, l), (b, a, l)) }
    val adj = und.map { case (a, b, _) => (a, b) }
    val elab = und.map { case (a, b, l) => (a, b) -> l }.toMap
    val names = q.vertices.map(_.name)
    def consistent(assign: Map[String, Long]): Boolean = q.edges.forall { e =>
      if (assign.contains(e.u) && assign.contains(e.v)) {
        val key = (assign(e.u), assign(e.v))
        adj.contains(key) && e.elabel.forall(_ == elab(key))
      } else true
    }
    def rec(i: Int, assign: Map[String, Long]): Long =
      if (i == names.size) 1L
      else {
        val nm = names(i)
        verts.keys.toSeq
          .filter(v => homo || !assign.valuesIterator.contains(v))
          .filter(v => q.byName(nm).vlabel.forall(_ == verts(v)))
          .map { v =>
            val a2 = assign + (nm -> v)
            if (consistent(a2)) rec(i + 1, a2) else 0L
          }.sum
      }
    rec(0, Map.empty)
  }

  def randomLabeled(seed: Int, n: Int = 14, m: Int = 34, nLabels: Int = 3)
      : (Map[Long, Int], Set[(Long, Long, Int)]) = {
    val rnd = new scala.util.Random(seed)
    val verts = (0L until n).map(v => v -> rnd.nextInt(nLabels)).toMap
    val edges = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    while (edges.size < m) {
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      if (a != b) {
        val (lo, hi) = if (a < b) (a, b) else (b, a)
        if (!edges.exists(e => e._1 == lo && e._2 == hi))
          edges += ((lo, hi, rnd.nextInt(2)))
      }
    }
    (verts, edges.toSet)
  }
}

class MatchingR3Spec extends SparkSpec {
  import MatchFixtures._

  private def toDfs(verts: Map[Long, Int], edges: Set[(Long, Long, Int)]) = {
    import spark.implicits._
    (edges.toSeq.toDF("src", "dst", "elabel"),
      verts.toSeq.toDF("id", "vlabel"))
  }

  test("automorphism groups: clique4 |Aut|=24, path3 |Aut|=2, tailed triangle |Aut|=2") {
    assert(GraphMatcher.automorphisms(QueryGraph.clique(4)).size == 24)
    assert(GraphMatcher.automorphisms(
      QueryGraph.path(Seq(None, None, None), Seq(None, None))).size == 2)
    val tailed = QueryGraph(
      Seq(QVertex("a"), QVertex("b"), QVertex("c"), QVertex("d", Some(2))),
      Seq(QEdge("a", "b"), QEdge("b", "c"), QEdge("a", "c"), QEdge("c", "d")))
    assert(GraphMatcher.automorphisms(tailed).size == 2) // a <-> b
    // labels break symmetry: a 2-path with distinct endpoint labels is rigid
    assert(GraphMatcher.automorphisms(
      QueryGraph.path(Seq(Some(0), Some(1), Some(2)), Seq(None, None))).size == 1)
  }

  test("countMatchesAuto (symmetry-broken x |Aut|) equals plain enumeration") {
    val qs = Seq(
      QueryGraph.clique(4, Some(1)),
      QueryGraph.triangle,
      QueryGraph.path(Seq(None, None, None), Seq(None, None)),
      QueryGraph(
        Seq(QVertex("a"), QVertex("b"), QVertex("c"), QVertex("d", Some(2))),
        Seq(QEdge("a", "b"), QEdge("b", "c"), QEdge("a", "c"), QEdge("c", "d"))))
    for (seed <- Seq(1, 4); q <- qs) {
      val (verts, edges) = randomLabeled(seed)
      val (eDF, vDF) = toDfs(verts, edges)
      val got = GraphMatcher.countMatchesAuto(spark, q, eDF, vDF).head().getLong(0)
      val want = brute(q, verts, edges)
      assert(got == want, s"auto seed=$seed q=${q.edges}: got $got want $want")
    }
  }

  private def star(centerL: Option[Int], leafLs: Seq[Option[Int]]): QueryGraph =
    QueryGraph(
      QVertex("u1", centerL) +: leafLs.zipWithIndex.map { case (l, i) => QVertex(s"u${i + 2}", l) },
      leafLs.indices.map(i => QEdge("u1", s"u${i + 2}")))

  test("countMatchesShell: falling-factorial shell counts equal enumeration") {
    for (seed <- Seq(2, 9)) {
      val (verts, edges) = randomLabeled(seed, n = 16, m = 40)
      val (eDF, vDF) = toDfs(verts, edges)
      // uniform star (one group), mixed-label star (two vlabel-disjoint
      // groups), wildcard star (one group, wildcard ok when alone)
      val cases = Seq(
        star(Some(1), Seq(Some(2), Some(2), Some(2))),
        star(Some(0), Seq(Some(1), Some(1), Some(2))),
        star(Some(1), Seq(None, None)),
        // core with an edge + shell: tailed triangle (d is the shell)
        QueryGraph(
          Seq(QVertex("a"), QVertex("b"), QVertex("c"), QVertex("d", Some(2))),
          Seq(QEdge("a", "b"), QEdge("b", "c"), QEdge("a", "c"), QEdge("c", "d"))))
      cases.foreach { q =>
        val got = GraphMatcher.countMatchesShell(spark, q, eDF, vDF)
        assert(got.isDefined, s"$q should be shell-countable")
        val n = got.get.head().getLong(0)
        val want = brute(q, verts, edges)
        assert(n == want, s"shell seed=$seed q=${q.edges}: got $n want $want")
        // homomorphic: plain product, no exclusions
        val gotH = GraphMatcher.countMatchesShell(spark, q, eDF, vDF, homomorphic = true)
        assert(gotH.get.head().getLong(0) == brute(q, verts, edges, homo = true),
          s"homo shell seed=$seed q=${q.edges}")
      }
    }
  }

  test("countMatchesShell refuses unsound decompositions (overlapping groups)") {
    val (verts, edges) = randomLabeled(3)
    val (eDF, vDF) = toDfs(verts, edges)
    // wildcard group + concrete group at the same attach: candidate sets
    // overlap, injective counting not expressible as a product
    assert(GraphMatcher.countMatchesShell(spark,
      star(Some(1), Seq(None, Some(2))), eDF, vDF).isEmpty)
    // single edge: no core
    assert(GraphMatcher.countMatchesShell(spark,
      QueryGraph(Seq(QVertex("a"), QVertex("b")), Seq(QEdge("a", "b"))), eDF, vDF).isEmpty)
    // but the same overlapping query IS homomorphically shell-countable
    assert(GraphMatcher.countMatchesShell(spark,
      star(Some(1), Seq(None, Some(2))), eDF, vDF, homomorphic = true).isDefined)
  }

  test("cost-weighted order (X4) beats greedy min-frequency on fan-out composition") {
    import spark.implicits._
    // 50 l0-srcs -> 1 l1-hub -> 100 l2-mids; 60 mids -> 60 l3-tails.
    // greedy seeds the rarest edge (l0-l1, 50) and immediately fans through
    // the hub (5000 intermediate rows); the cost order seeds l2-l3 (60) and
    // walks the 1:1 side first.
    val verts = ((0L until 50L).map(_ -> 0) ++ Seq(1000L -> 1) ++
      (2000L until 2100L).map(_ -> 2) ++ (3000L until 3060L).map(_ -> 3)).toMap
    val edges = ((0L until 50L).map(s => (s, 1000L, 0)) ++
      (2000L until 2100L).map(m => (1000L, m, 0)) ++
      (2000L until 2060L).map(m => (m, m + 1000L, 0))).toSet
    val (eDF, vDF) = toDfs(verts, edges)
    val q = QueryGraph.path(Seq(Some(0), Some(1), Some(2), Some(3)), Seq(None, None, None))

    val rel = GraphMatcher.materializedRelation(eDF, vDF)
    val greedy = GraphMatcher.matchingOrder(q, GraphMatcher.edgeFrequencies(q, rel))
    val cost = GraphMatcher.matchingOrderByCost(q, GraphMatcher.edgeStatistics(q, rel))
    assert(greedy.head == QEdge("u1", "u2"), "greedy seeds the min-frequency edge")
    assert(cost.head == QEdge("u3", "u4"), "cost order seeds the low-fan-out chain")

    val fGreedy = GraphMatcher.matchingFunnel(spark, q, eDF, vDF,
      orderOverride = Some(greedy)).map(_._4)
    val fCost = GraphMatcher.matchingFunnel(spark, q, eDF, vDF,
      orderOverride = Some(cost)).map(_._4)
    assert(fGreedy.last == fCost.last, "same final match count")
    assert(fCost.sum < fGreedy.sum,
      s"cost order total intermediate rows ${fCost.sum} !< greedy ${fGreedy.sum}")
    assert(fGreedy.max >= 5000L && fCost.max < 4000L,
      s"greedy peaks at ${fGreedy.max}, cost at ${fCost.max}")
    // matches found are identical
    val c1 = GraphMatcher.countMatches(spark, q, eDF, vDF).head().getLong(0)
    assert(c1 == brute(q, verts, edges))
  }

  test("findMatchesIndexed (shared relation) preserves results") {
    for ((q, seed) <- Seq(
      (QueryGraph.path(Seq(Some(0), Some(1), Some(2)), Seq(Some(1), Some(0))), 11),
      (QueryGraph.triangle, 12))) {
      val (verts, edges) = randomLabeled(seed)
      val (eDF, vDF) = toDfs(verts, edges)
      val withIdx = GraphMatcher.findMatchesIndexed(spark, q, eDF, vDF, rounds = 2).count()
      val without = GraphMatcher.findMatches(spark, q, eDF, vDF).count()
      assert(withIdx == without)
    }
  }

  private def candSets(idx: CandidateIndex.Index): Map[String, Set[Long]] =
    idx.candidates.map { case (k, df) =>
      k -> df.collect().map(_.getLong(0)).toSet
    }

  test("refreshAfterAdds == full rebuild, touching only the delta frontier (X3)") {
    import spark.implicits._
    // long labeled ring (sparse, so the frontier stays local): 400 vertices,
    // labels i%3, ring edges; delta = 3 chords
    val n = 400
    val verts = (0L until n.toLong).map(v => v -> (v % 3).toInt).toMap
    val ring = (0L until n.toLong).map(v => (v, (v + 1) % n, (v % 2).toInt)).toSet
    val chords = Set((10L, 200L, 1), (50L, 300L, 0), (120L, 340L, 1))
    val vDF = verts.toSeq.toDF("id", "vlabel")
    val baseDF = ring.toSeq.toDF("src", "dst", "elabel")
    val allDF = (ring ++ chords).toSeq.toDF("src", "dst", "elabel")
    val addsDF = chords.toSeq.map(c => (c._1, c._2)).toDF("src", "dst")
    val q = QueryGraph.path(Seq(Some(0), Some(1), Some(2)), Seq(Some(1), Some(0)))

    val relOld = GraphMatcher.materializedRelation(baseDF, vDF)
    val relNew = GraphMatcher.materializedRelation(allDF, vDF)
    val idx0 = CandidateIndex.buildOnRel(spark, q, relOld, vDF, rounds = 2)
    val (refreshed, stats) =
      CandidateIndex.refreshAfterAdds(spark, q, relNew, vDF, idx0, addsDF)
    val rebuilt = CandidateIndex.buildOnRel(spark, q, relNew, vDF, rounds = 2)
    assert(candSets(refreshed) == candSets(rebuilt),
      "incremental refresh must equal the from-scratch rebuild")
    assert(stats.frontierSizes.nonEmpty && stats.frontierSizes.forall(_ <= 60L),
      s"frontier sizes ${stats.frontierSizes} should be O(|delta| * deg^r), not O(|V|=$n)")
    // X5: the delta candidate views are exactly rebuild-minus-old, per round
    (0 to idx0.rounds).foreach { r =>
      val want = rebuilt.perRound(r).collect().map(x => (x.getString(0), x.getLong(1))).toSet --
        idx0.perRound(r).collect().map(x => (x.getString(0), x.getLong(1))).toSet
      val got = stats.deltaSets(r).collect().map(x => (x.getString(0), x.getLong(1))).toSet
      assert(got == want, s"delta candidate set round $r")
    }
  }

  test("refreshAfterAdds frontier ignores pre-existing non-matching-label vertices") {
    import spark.implicits._
    // 400 vertices but 3/4 carry label 9, which no query vertex matches —
    // round 0 excludes them, so an anti-join against round 0 would call them
    // all "new" every refresh (round-3 advice finding: O(|V|) frontier).
    val n = 400
    val verts = (0L until n.toLong)
      .map(v => v -> (if (v % 4 == 0L) (v % 3).toInt else 9)).toMap
    val ring = (0L until n.toLong).map(v => (v, (v + 1) % n, (v % 2).toInt)).toSet
    val chords = Set((16L, 200L, 1), (48L, 300L, 0))
    val vDF = verts.toSeq.toDF("id", "vlabel")
    val baseDF = ring.toSeq.toDF("src", "dst", "elabel")
    val allDF = (ring ++ chords).toSeq.toDF("src", "dst", "elabel")
    val addsDF = chords.toSeq.map(c => (c._1, c._2)).toDF("src", "dst")
    val q = QueryGraph.path(Seq(Some(0), Some(1), Some(2)), Seq(Some(1), Some(0)))

    val relOld = GraphMatcher.materializedRelation(baseDF, vDF)
    val relNew = GraphMatcher.materializedRelation(allDF, vDF)
    val idx0 = CandidateIndex.buildOnRel(spark, q, relOld, vDF, rounds = 2)
    val (refreshed, stats) =
      CandidateIndex.refreshAfterAdds(spark, q, relNew, vDF, idx0, addsDF)
    val rebuilt = CandidateIndex.buildOnRel(spark, q, relNew, vDF, rounds = 2)
    assert(candSets(refreshed) == candSets(rebuilt))
    assert(stats.frontierSizes.forall(_ <= 40L),
      s"frontier ${stats.frontierSizes} must stay O(|delta|*deg^r); " +
        s"non-matching-label vertices (300 of $n) must not be re-seeded")
  }

  test("refreshAfterDeletes: shrink-only refresh stays result-preserving") {
    val (verts, edges) = randomLabeled(17, n = 16, m = 40)
    val dels = edges.take(6)
    val remaining = edges -- dels
    val (allDF, vDF) = toDfs(verts, edges)
    val (remDF, _) = toDfs(verts, remaining)
    val q = QueryGraph.path(Seq(Some(0), Some(1), Some(2)), Seq(Some(1), Some(0)))
    val relOld = GraphMatcher.materializedRelation(allDF, vDF)
    val relNew = GraphMatcher.materializedRelation(remDF, vDF)
    val idx0 = CandidateIndex.buildOnRel(spark, q, relOld, vDF, rounds = 2)
    val refreshed = CandidateIndex.refreshAfterDeletes(spark, q, relNew, vDF, idx0)
    val withIdx = GraphMatcher.findMatches(spark, q, remDF, vDF,
      candidates = Some(refreshed.candidates)).count()
    val without = GraphMatcher.findMatches(spark, q, remDF, vDF).count()
    assert(withIdx == without)
    // and it can only have shrunk
    val before = candSets(idx0)
    candSets(refreshed).foreach { case (k, s) =>
      assert(s.subsetOf(before(k)), s"$k grew on delete")
    }
  }
}
