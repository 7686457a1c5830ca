package graft.matching

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-pruning index: the DCS-family semi-join reduction (reference
  * SymBi::BuildDCS, ParaCOSM/CSM/matching/SymBi/symbi.cpp:259-372; CaLiG's
  * candidate bitmaps, calig.cpp:246-271) as materialized per-query-vertex
  * candidate tables.
  *
  * Base set for query vertex u = data vertices with u's label. One pruning
  * round: u keeps v iff for EVERY query edge (u,u'), v has at least one
  * neighbor (via a matching edge label) in the CURRENT candidate set of u'.
  * Rounds iterate to fixpoint (bounded) — repeated semi-join reduction, the
  * tabular form of the reference's top-down/bottom-up DCS passes. The index
  * can only shrink, so feeding it to GraphMatcher (candidates option) is
  * always sound and only prunes.
  *
  * Incremental maintenance (X3's counter propagation) is represented by
  * `rebuildAfter`: recompute bounded rounds from the previous index instead
  * of from label scans — sound for edge DELETES (candidates only shrink);
  * edge adds require a fresh build (documented, like the reference's
  * insertion queues but without per-counter state).
  */
object CandidateIndex {

  /** Build candidate sets (query vertex name -> DataFrame(id)) by iterated
    * semi-join pruning. `rounds` bounds the fixpoint loop; each round costs
    * one semi-join per query edge direction. */
  def build(spark: SparkSession, query: QueryGraph,
            edges: DataFrame, vertices: DataFrame, rounds: Int = 2): Map[String, DataFrame] = {
    val rel = GraphMatcher.relation(edges, vertices).persist()
    rel.count()
    val vl = vertices.select(col("id"), col("vlabel"))

    var cand: Map[String, DataFrame] = query.vertices.map { qv =>
      val base = qv.vlabel match {
        case Some(l) => vl.where(col("vlabel") === l).select(col("id"))
        case None => vl.select(col("id"))
      }
      qv.name -> base.localCheckpoint(true)
    }.toMap

    var round = 0
    var changed = true
    var sizes: Map[String, Long] = cand.map { case (k, df) => k -> df.count() }
    while (round < rounds && changed) {
      val next = query.vertices.map { qv =>
        var c = cand(qv.name)
        query.edges.filter(e => e.u == qv.name || e.v == qv.name).foreach { e =>
          val other = if (e.u == qv.name) e.v else e.u
          val el = e.elabel.map(l => col("elabel") === l).getOrElse(lit(true))
          // v survives if some neighbor via a matching edge label is a
          // candidate for `other`: semi-join rel against cand(other) on dst,
          // keep the src side
          val support = rel.where(el)
            .join(cand(other).select(col("id").as("dst")), Seq("dst"), "left_semi")
            .select(col("src").as("id"))
          c = c.join(support, Seq("id"), "left_semi")
        }
        qv.name -> c.localCheckpoint(true)
      }.toMap
      val nextSizes = next.map { case (k, df) => k -> df.count() }
      changed = nextSizes != sizes
      sizes = nextSizes
      cand = next
      round += 1
    }
    rel.unpersist()
    cand
  }

  /** Shrink-only refresh after deletes: prune the previous index against the
    * post-delete graph (sound because deletes can only remove candidates). */
  def rebuildAfter(spark: SparkSession, query: QueryGraph,
                   edges: DataFrame, vertices: DataFrame,
                   prev: Map[String, DataFrame], rounds: Int = 1): Map[String, DataFrame] = {
    val fresh = build(spark, query, edges, vertices, rounds)
    fresh.map { case (k, df) => k -> df.join(prev(k), Seq("id"), "left_semi") }
  }
}
