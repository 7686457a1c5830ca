package graft.matching

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General labeled subgraph matching — the reference's core capability
  * (ParaCOSM is a Continuous Subgraph Matching framework; the static search
  * is Graphflow::FindMatches, ParaCOSM/CSM/matching/GraphFlow/graphflow.cpp:
  * 181-265), re-expressed as a selectivity-ordered LEFT-DEEP JOIN PLAN over
  * the labeled edge relation instead of row-at-a-time backtracking:
  *
  *  - matching order: per-query-edge frequency stats in ONE scan (the
  *    reference's BuildDAG frequency pass, SymBi symbi.cpp:126-176), then
  *    greedy min-frequency expansion from the rarest edge — each step picks
  *    the cheapest CONNECTED query edge (J5's left-deep SJ-Tree shape,
  *    sj_tree.cpp:125-182, with X1's ordering heuristic);
  *  - an edge whose far endpoint is unbound EXTENDS the partial-match
  *    relation (inner join, J1's candidate scan); an edge with both
  *    endpoints bound is a CLOSING existence check (left-semi join, J1's
  *    joinability binary search, graphflow.cpp:223-242);
  *  - injectivity (subgraph isomorphism's visited check, graphflow.cpp:247)
  *    = inequality predicates between the new column and every bound column;
  *    `homomorphic = true` drops them (the reference's --homo flag);
  *  - count-only queries never materialize match rows past the last join
  *    (CaLiG-style late materialization, calig.cpp:495-514);
  *  - `maxResults` truncates enumeration (the reference's max_num_results_
  *    guard, F6/O3).
  *
  * Scale shape: every extension is an equi-join partial(u) = rel(src) — the
  * shuffle key is a vertex id, so AQE skew-join handles power-law hubs; the
  * per-edge label filters reach the scan as pushed predicates; the rel table
  * is built once per run and reused by every join (one persisted symmetric
  * relation, not |E(Q)| scans of the raw table).
  */
object GraphMatcher {

  /** Labeled, symmetrized data relation every query edge filters from:
    * (src, dst, elabel, slabel, dlabel). Vertices: (id, vlabel). Edges are
    * undirected (reference graph.h:63) — both orientations materialized so
    * every join is a plain equi-join on src. */
  def relation(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"), col("elabel"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("elabel")))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
    val vl = vertices.select(col("id"), col("vlabel"))
    und
      .join(vl.withColumnRenamed("id", "src").withColumnRenamed("vlabel", "slabel"), Seq("src"))
      .join(vl.withColumnRenamed("id", "dst").withColumnRenamed("vlabel", "dlabel"), Seq("dst"))
      .select(col("src"), col("dst"), col("elabel"), col("slabel"), col("dlabel"))
  }

  /** Per-edge filter with `u` matched at src and `v` at dst (rel is
    * symmetric, so this one orientation covers both). */
  private def edgeCond(q: QueryGraph, e: QEdge, rel: DataFrame): Column = {
    val el = e.elabel.map(l => rel("elabel") === l).getOrElse(lit(true))
    val sl = q.byName(e.u).vlabel.map(l => rel("slabel") === l).getOrElse(lit(true))
    val dl = q.byName(e.v).vlabel.map(l => rel("dlabel") === l).getOrElse(lit(true))
    el && sl && dl
  }

  /** One-scan edge-frequency statistics (X1): query-edge -> matching data
    * edge count, via conditional sums in a single aggregate job. */
  def edgeFrequencies(query: QueryGraph, rel: DataFrame): Map[QEdge, Long] = {
    val aggs = query.edges.zipWithIndex.map { case (e, i) =>
      sum(when(edgeCond(query, e, rel), 1L).otherwise(0L)).as(s"f$i")
    }
    val row = rel.agg(aggs.head, aggs.tail: _*).head()
    query.edges.zipWithIndex.map { case (e, i) =>
      e -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
  }

  /** Greedy selectivity order: rarest edge first, then always the
    * min-frequency edge touching the bound set (left-deep; closing edges
    * are picked as soon as both endpoints are bound — they only shrink). */
  def matchingOrder(query: QueryGraph, freq: Map[QEdge, Long]): Seq[QEdge] = {
    require(query.edges.nonEmpty, "query graph has no edges")
    val remaining = scala.collection.mutable.Set(query.edges: _*)
    val order = scala.collection.mutable.ArrayBuffer.empty[QEdge]
    val bound = scala.collection.mutable.Set.empty[String]
    val first = query.edges.minBy(e => (freq(e), e.u, e.v))
    order += first; remaining -= first; bound += first.u; bound += first.v
    while (remaining.nonEmpty) {
      val closing = remaining.filter(e => bound(e.u) && bound(e.v))
      val next =
        if (closing.nonEmpty) closing.minBy(e => (freq(e), e.u, e.v))
        else {
          val touching = remaining.filter(e => bound(e.u) || bound(e.v))
          require(touching.nonEmpty, "query graph must be connected")
          touching.minBy(e => (freq(e), e.u, e.v))
        }
      order += next; remaining -= next; bound += next.u; bound += next.v
    }
    order.toSeq
  }

  /** Enumerate all matches: one column per query vertex (named), one row per
    * embedding. Isomorphic (injective) by default. */
  def findMatches(spark: SparkSession, query: QueryGraph,
                  edges: DataFrame, vertices: DataFrame,
                  homomorphic: Boolean = false,
                  maxResults: Option[Int] = None,
                  candidates: Option[Map[String, DataFrame]] = None): DataFrame = {
    val rel0 = relation(edges, vertices)
    val rel = rel0.persist()
    rel.count()
    val order = matchingOrder(query, edgeFrequencies(query, rel))
    val out = plan(query, rel, order, homomorphic, carryFlag = false, candidates)
    maxResults.map(out.limit).getOrElse(out)
  }

  /** Count of matches as a 1-row DataFrame (count-only late
    * materialization — G6). Column name `matches`. */
  def countMatches(spark: SparkSession, query: QueryGraph,
                   edges: DataFrame, vertices: DataFrame,
                   homomorphic: Boolean = false): DataFrame =
    findMatches(spark, query, edges, vertices, homomorphic)
      .agg(count(lit(1)).as("matches"))

  /** Count of matches using at least one delta edge — the positive/negative
    * result maintenance join (J3/J4, graphflow.cpp:289-416), batched: edges
    * carry an `isNew` boolean; closing checks become inner joins so every
    * query edge's flag survives to the final any-flag filter. Each embedding
    * is still counted once (the relation is unique on (src,dst)). */
  def countDeltaMatches(spark: SparkSession, query: QueryGraph,
                        edges: DataFrame, vertices: DataFrame,
                        homomorphic: Boolean = false): DataFrame = {
    val rel0 = relation(edges, vertices)
      .join(edges.select(col("src"), col("dst"), col("isNew"))
          .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("isNew")))
          .dropDuplicates("src", "dst"),
        Seq("src", "dst"), "left_outer")
      .withColumn("isNew", coalesce(col("isNew"), lit(false)))
    val rel = rel0.persist()
    rel.count()
    val order = matchingOrder(query, edgeFrequencies(query, rel))
    val matches = plan(query, rel, order, homomorphic, carryFlag = true, None)
    val anyNew = (0 until query.edges.size).map(i => col(s"_f$i")).reduce(_ || _)
    matches.where(anyNew).agg(count(lit(1)).as("delta_matches"))
  }

  /** Pruning-funnel diagnostics (G3): partial-match cardinality after each
    * join stage of the selectivity order — the reference's per-stage counter
    * report, as a small driver-side table. One count job per stage, so this
    * is a DEBUG surface, not a hot path. Rows: (stage, edge, kind, rows). */
  def matchingFunnel(spark: SparkSession, query: QueryGraph,
                     edges: DataFrame, vertices: DataFrame,
                     homomorphic: Boolean = false): Seq[(Int, String, String, Long)] = {
    val rel = relation(edges, vertices).persist()
    rel.count()
    val order = matchingOrder(query, edgeFrequencies(query, rel))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var bound = Vector(order.head.u, order.head.v)
    for (k <- 1 to order.size) {
      val prefix = order.take(k)
      val kind =
        if (k == 1) "seed"
        else if (bound.contains(prefix.last.u) && bound.contains(prefix.last.v)) "closing"
        else "extend"
      if (k > 1 && kind == "extend")
        bound = bound :+ (if (bound.contains(prefix.last.u)) prefix.last.v else prefix.last.u)
      val n = plan(query, rel, prefix, homomorphic, carryFlag = false, None).count()
      out += ((k, s"${prefix.last.u}-${prefix.last.v}", kind, n))
    }
    rel.unpersist()
    out.toSeq
  }

  /** Count matches whose image CONTAINS the single edge (a, b) — the
    * reference's per-update delta search seeded from the new/deleted edge
    * (Graphflow::AddEdge binds the update edge to every compatible query
    * edge in both orientations and extends from there,
    * graphflow.cpp:311-351). Exact: under an injective vertex mapping no
    * two query edges can map to the same data edge, so the per-position
    * counts are disjoint and their sum is the total. */
  def countMatchesThrough(spark: SparkSession, query: QueryGraph,
                          edges: DataFrame, vertices: DataFrame,
                          a: Long, b: Long,
                          homomorphic: Boolean = false): Long = {
    val rel = relation(edges, vertices).persist()
    rel.count()
    val freq = edgeFrequencies(query, rel)
    var total = 0L
    query.edges.foreach { qe =>
      // force qe first in the order, then greedy as usual over the rest
      val rest = matchingOrder(
        QueryGraph(query.vertices, Seq(qe) ++ query.edges.filterNot(_ == qe)),
        freq + (qe -> -1L)) // -1 pins qe as the unconditional first pick
      Seq((a, b), (b, a)).foreach { case (s, d) =>
        val seeded = rel.where(col("src") === s && col("dst") === d)
        val relSeeded = rel // closing/extension edges still scan the graph
        total += planSeeded(query, relSeeded, seeded, rest, homomorphic)
          .agg(count(lit(1)).as("n")).head().getLong(0)
      }
    }
    rel.unpersist()
    total
  }

  /** plan() with the first edge's relation replaced by the seeded slice. */
  private def planSeeded(query: QueryGraph, rel: DataFrame, seed: DataFrame,
                         order: Seq[QEdge], homomorphic: Boolean): DataFrame = {
    val e0 = order.head
    val cond = {
      val el = e0.elabel.map(l => seed("elabel") === l).getOrElse(lit(true))
      val sl = query.byName(e0.u).vlabel.map(l => seed("slabel") === l).getOrElse(lit(true))
      val dl = query.byName(e0.v).vlabel.map(l => seed("dlabel") === l).getOrElse(lit(true))
      el && sl && dl
    }
    val first = seed.where(cond)
      .select(col("src").as(e0.u), col("dst").as(e0.v))
    continuePlan(query, rel, first, Vector(e0.u, e0.v), order.tail, homomorphic)
  }

  /** Extend a partial-match relation through the remaining ordered edges
    * (no flags/candidates — the seeded path). */
  private def continuePlan(query: QueryGraph, rel: DataFrame, partial0: DataFrame,
                           bound0: Vector[String], rest: Seq[QEdge],
                           homomorphic: Boolean): DataFrame = {
    var partial = if (homomorphic) partial0
      else partial0.where(col(bound0(0)) =!= col(bound0(1)))
    var bound = bound0
    var i = 0
    rest.foreach { e =>
      val alias = s"s$i"
      val r = {
        val el = e.elabel.map(l => rel("elabel") === l).getOrElse(lit(true))
        val sl = query.byName(e.u).vlabel.map(l => rel("slabel") === l).getOrElse(lit(true))
        val dl = query.byName(e.v).vlabel.map(l => rel("dlabel") === l).getOrElse(lit(true))
        // orient the filter to however this edge joins below
        if (bound.contains(e.u)) rel.where(el && sl && dl).as(alias)
        else rel.select(col("dst").as("src"), col("src").as("dst"),
          col("elabel"), col("dlabel").as("slabel"), col("slabel").as("dlabel"))
          .where(el && sl && dl).as(alias)
      }
      if (bound.contains(e.u) && bound.contains(e.v)) {
        partial = partial.join(r,
          partial(e.u) === col(s"$alias.src") && partial(e.v) === col(s"$alias.dst"),
          "left_semi")
      } else {
        val (known, newV) = if (bound.contains(e.u)) (e.u, e.v) else (e.v, e.u)
        val joined = partial.join(r, partial(known) === col(s"$alias.src"))
        val inj =
          if (homomorphic) joined
          else joined.where(bound.map(b => col(s"$alias.dst") =!= partial(b))
            .reduce(_ && _))
        partial = inj.select(
          bound.map(partial(_)) :+ col(s"$alias.dst").as(newV): _*)
        bound = bound :+ newV
      }
      i += 1
    }
    partial
  }

  /** The left-deep join plan over an ordered edge list. */
  private def plan(query: QueryGraph, rel: DataFrame, order: Seq[QEdge],
                   homomorphic: Boolean, carryFlag: Boolean,
                   candidates: Option[Map[String, DataFrame]]): DataFrame = {

    def filtered(e: QEdge, u: String, v: String, alias: String): DataFrame = {
      // u at src, v at dst; optional candidate-index semi-joins (X2)
      var r = rel.where(edgeCond(query, QEdge(u, v, e.elabel), rel))
      candidates.foreach { c =>
        c.get(u).foreach(cu => r = r.join(
          cu.select(col("id").as("src")), Seq("src"), "left_semi"))
        c.get(v).foreach(cv => r = r.join(
          cv.select(col("id").as("dst")), Seq("dst"), "left_semi"))
      }
      r.as(alias)
    }

    val e0 = order.head
    val flagCols0 = if (carryFlag) Seq(col("r0.isNew").as("_f0")) else Seq.empty
    var partial = filtered(e0, e0.u, e0.v, "r0")
      .select(Seq(col("r0.src").as(e0.u), col("r0.dst").as(e0.v)) ++ flagCols0: _*)
    var bound = Vector(e0.u, e0.v)
    var flagIdx = 1

    order.tail.foreach { e =>
      val alias = s"r$flagIdx"
      val bothBound = bound.contains(e.u) && bound.contains(e.v)
      if (bothBound) {
        val r = filtered(e, e.u, e.v, alias)
        if (carryFlag) {
          val joined = partial.join(r,
            partial(e.u) === col(s"$alias.src") && partial(e.v) === col(s"$alias.dst"))
          partial = joined.select(
            bound.map(partial(_)) ++
              (0 until flagIdx).map(i => partial(s"_f$i")) :+
              col(s"$alias.isNew").as(s"_f$flagIdx"): _*)
        } else {
          partial = partial.join(r,
            partial(e.u) === col(s"$alias.src") && partial(e.v) === col(s"$alias.dst"),
            "left_semi")
        }
      } else {
        val (known, newV) = if (bound.contains(e.u)) (e.u, e.v) else (e.v, e.u)
        val r = filtered(e, known, newV, alias)
        val joined = partial.join(r, partial(known) === col(s"$alias.src"))
        val inj =
          if (homomorphic) joined
          else joined.where(bound.filter(_ != known)
            .map(b => col(s"$alias.dst") =!= partial(b))
            .foldLeft(col(s"$alias.dst") =!= partial(known))(_ && _))
        val flagCols =
          if (carryFlag)
            (0 until flagIdx).map(i => partial(s"_f$i")) :+
              col(s"$alias.isNew").as(s"_f$flagIdx")
          else Seq.empty
        partial = inj.select(
          bound.map(partial(_)) ++ Seq(col(s"$alias.dst").as(newV)) ++ flagCols: _*)
        bound = bound :+ newV
      }
      flagIdx += 1
    }
    partial
  }
}
