package graft.matching

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.GraphUpdate

/** Safe-update classification + multi-query routing for subgraph matching —
  * the reference's inter-update parallelism core:
  *
  *  - Classify (ParaCOSM/CSM/matching/Parallel_GraphFlow/
  *    parallel_graphflow.cpp:1990-2016): an edge update whose LABEL
  *    SIGNATURE (srcLabel, dstLabel, edgeLabel) matches no query edge can
  *    never change the result set — apply it without search. On the Amazon
  *    benchmark ~90% of updates are safe (BASELINE.md).
  *  - Multi-query routing (NewSP's updateEdgeFindQuery keyed by Edge
  *    label-signature, newSP.h:16-18): one delta scan feeds only the query
  *    graphs whose signature set contains the update's signature.
  *
  * Here both are ONE broadcast join: the signature set of a query graph is
  * tiny (≤ |E(Q)| × orientations), so classification of a micro-batch is a
  * broadcast-hash filter — the cheap predicate in front of the expensive
  * delta join, exactly the reference's design, in Spark's natural shape.
  */
object MatchClassifier {

  /** The (unordered) label-signature rows a query graph listens to:
    * (l1, l2, elabel) with l1 <= l2; None (wildcard) expands to -1 meaning
    * "any" and is handled by the join condition. */
  def signatures(spark: SparkSession, query: QueryGraph): DataFrame = {
    import spark.implicits._
    val rows = query.edges.map { e =>
      val lu = query.byName(e.u).vlabel.getOrElse(-1)
      val lv = query.byName(e.v).vlabel.getOrElse(-1)
      val (a, b) = if (lu <= lv) (lu, lv) else (lv, lu)
      (a, b, e.elabel.getOrElse(-1))
    }.distinct
    rows.toDF("sl1", "sl2", "selabel")
  }

  /** Classify edge updates against one or more query graphs: returns the
    * batch with a `safe` column (true = provably result-neutral for EVERY
    * query) and a `queries` array column naming the query graphs whose
    * signature set the update hits (the routing table). Vertex updates are
    * label-neutral here: adds are always safe; deletes are unsafe if the
    * vertex's label appears in any query (conservative, like the
    * reference's always-unsafe vertex deletes, main.cpp:301-313). */
  def classify(spark: SparkSession, queries: Map[String, QueryGraph],
               vertices: DataFrame, updates: Dataset[GraphUpdate]): DataFrame = {
    val sigs = queries.toSeq.map { case (name, q) =>
      signatures(spark, q).withColumn("qname", lit(name))
    }.reduce(_ unionByName _)

    val vl = vertices.select(col("id"), col("vlabel"))
    val u = updates.toDF()
      .join(vl.withColumnRenamed("id", "id1").withColumnRenamed("vlabel", "l1"),
        Seq("id1"), "left_outer")
      .join(vl.withColumnRenamed("id", "id2").withColumnRenamed("vlabel", "l2"),
        Seq("id2"), "left_outer")
      // least/greatest SKIP nulls, which would silently substitute the one
      // known label for both slots — if either endpoint label is unknown the
      // whole signature must go wildcard (null), see the join comment below
      .withColumn("lo", when(col("l1").isNull || col("l2").isNull, lit(null))
        .otherwise(least(col("l1"), col("l2"))))
      .withColumn("hi", when(col("l1").isNull || col("l2").isNull, lit(null))
        .otherwise(greatest(col("l1"), col("l2"))))

    // broadcast the tiny signature table; wildcard (-1) matches anything.
    // A NULL endpoint label (vertex unknown to `vertices` — e.g. added
    // earlier in the same micro-batch or out-of-order CDC) also matches
    // anything: classifying it safe would be UNSOUND (Classify may only skip
    // provably result-neutral updates), so unknown labels route to every
    // query and come out unsafe.
    val hit = u.join(broadcast(sigs),
        (sigs("sl1") === lit(-1) || col("lo").isNull || sigs("sl1") === col("lo")) &&
          (sigs("sl2") === lit(-1) || col("hi").isNull || sigs("sl2") === col("hi")) &&
          (sigs("selabel") === lit(-1) || sigs("selabel") === col("label")),
        "left_outer")
      .groupBy(col("seq"), col("op"), col("id1"), col("id2"), col("label"))
      .agg(collect_set(col("qname")).as("queries"))

    hit.withColumn("safe",
      when(col("op") === "v", lit(true))
        .when(col("op").isin("e", "-e"), size(col("queries")) === 0)
        .otherwise(lit(false))) // -v conservative: always unsafe
  }
}
