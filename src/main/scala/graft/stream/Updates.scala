package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algo.{AlgoResult, ConnectedComponents}
import graft.graph.GraphUpdate

/** Update-stream (CDC) application + safe/unsafe classification.
  *
  * Reference semantics being reproduced (SURVEY.md §2.2, §2.5-P5, §3.3):
  *  - `InsertUnit {v|-v|e|-e}` records applied in stream order
  *    (ParaCOSM/CSM/utils/types.h:34-42, graph.cpp:251-285);
  *  - mutations are M1-M4 (AddVertex/RemoveVertex/AddEdge/RemoveEdge,
  *    graph.cpp:23-116) — here pure table algebra: union / dedup /
  *    anti-join, never in-place mutation;
  *  - the safe-update mechanism: classify each update with a cheap
  *    predicate; updates that provably cannot change the result skip the
  *    expensive recompute (Classify, parallel_graphflow.cpp:1990-2016;
  *    window protocol BatchUpdates3, main.cpp:253-397). For connected
  *    components the predicate is: an edge insert whose endpoints already
  *    share a label is safe; vertex/edge deletes are always unsafe (the
  *    reference also treats vertex deletes as always-unsafe,
  *    main.cpp:301-313).
  *
  * Batch compaction: within one micro-batch, the LAST op per key wins
  * (vertex key = id; edge key = (id1,id2)) — standard CDC log compaction.
  * Compaction is PER-KEY only: it is equivalent to sequential in-order
  * application whenever the batch has no vertex delete, because v/e/-e ops
  * touch only their own key. A `-v` interacts across keys (it cascades to
  * incident edges), so a batch mixing `-v` with other ops is applied as
  * seq-ordered SEGMENTS split at each vertex delete — exact sequential
  * semantics at the cost of one table-algebra pass per segment (vertex
  * deletes are rare in web-crawl CDC, so the common path stays one pass).
  */
object Updates {

  /** Last-op-per-key compaction of a micro-batch. */
  def compact(batch: Dataset[GraphUpdate]): DataFrame = {
    val df = batch.toDF()
    val isEdge = col("op").isin("e", "-e")
    val keyed = df.withColumn("kind", when(isEdge, "e").otherwise("v"))
      .withColumn("k1", col("id1"))
      .withColumn("k2", when(isEdge, col("id2")).otherwise(lit(0L)))
    val w = Window.partitionBy(col("kind"), col("k1"), col("k2")).orderBy(col("seq").desc)
    keyed.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("seq"), col("op"), col("id1"), col("id2"), col("label"))
  }

  /** Apply one micro-batch to (vertices, edges) with exact sequential
    * semantics. Fast path: no `-v` in the batch → one compacted pass.
    * Hazard path: `-v` mixed with other ops → split at each vertex delete
    * into seq-ordered segments (see class doc); each segment is itself
    * hazard-free so compaction within it is sound.
    * Validation mirrors the reference's hard protocol errors (deleting a
    * non-existent edge aborts, graph.cpp:98-102) when `strict`. */
  def applyBatch(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                 batch: Dataset[GraphUpdate], strict: Boolean = false): (DataFrame, DataFrame) = {
    import spark.implicits._
    val vDelSeqs = batch.filter(_.op == "-v").select(col("seq")).as[Long]
      .collect().sorted
    val nOps = batch.count()
    if (vDelSeqs.isEmpty || nOps == vDelSeqs.length)
      applySegment(spark, vertices, edges, batch, strict)
    else {
      // segment boundaries: (-inf, s1], (s1, s2], ..., (sk, +inf) with each
      // -v as the closing op of its segment — exact stream order
      val bounds = vDelSeqs.map(Some(_)) :+ None
      var lo = Long.MinValue
      var (v, e) = (vertices, edges)
      bounds.foreach { hi =>
        val seg = hi match {
          case Some(s) => batch.filter(u => u.seq > lo && u.seq <= s)
          case None => batch.filter(u => u.seq > lo)
        }
        if (hi.isEmpty || hi.exists(_ > lo)) {
          val (v1, e1) = applySegment(spark, v, e, seg, strict)
          v = v1.localCheckpoint(true)
          e = e1.localCheckpoint(true)
        }
        hi.foreach(s => lo = s)
      }
      (v, e)
    }
  }

  private def applySegment(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                           batch: Dataset[GraphUpdate], strict: Boolean): (DataFrame, DataFrame) = {
    val c = compact(batch).persist()

    val vAdds = c.where(col("op") === "v").select(col("id1").as("id"))
    val vDels = c.where(col("op") === "-v").select(col("id1").as("id"))
    val eAdds = c.where(col("op") === "e").select(col("id1").as("src"), col("id2").as("dst"))
    val eDels = c.where(col("op") === "-e").select(col("id1").as("src"), col("id2").as("dst"))

    if (strict) {
      val missingDel = eDels.join(edges, Seq("src", "dst"), "left_anti").count()
      require(missingDel == 0, s"-e for $missingDel non-existent edge(s) (reference aborts, graph.cpp:98-102)")
      val newVerts = vertices.select(col("id")).union(vAdds)
      val danglingEnds = eAdds.select(col("src").as("id"))
        .union(eAdds.select(col("dst").as("id")))
        .join(newVerts, Seq("id"), "left_anti").count()
      require(danglingEnds == 0, s"e with $danglingEnds endpoint(s) not present (endpoints must exist first)")
    }

    // M1 add vertices; M2 remove vertices (and incident edges). Rows ARE
    // their keys here, so upsert = delete-then-union — broadcast-only (a
    // whole-table distinct would shuffle V per batch for a |Δ|-sized change)
    val v1 = vertices.select(col("id"))
      .join(broadcast(vAdds), Seq("id"), "left_anti").union(vAdds)
      .join(broadcast(vDels), Seq("id"), "left_anti")

    // M3 add edges (dedup, no self loops); M4 remove edges; cascade -v —
    // same delete-then-union shape (the previous whole-table dropDuplicates
    // was an O(|E|) shuffle per micro-batch).
    // Final select: a USING join (Seq("dst")) reorders columns dst-first,
    // which would silently swap positional consumers — pin the order.
    val e1 = edges.select(col("src"), col("dst"))
      .join(broadcast(eAdds), Seq("src", "dst"), "left_anti")
      .union(eAdds.where(col("src") =!= col("dst")))
      .join(broadcast(eDels), Seq("src", "dst"), "left_anti")
      .join(broadcast(vDels.withColumnRenamed("id", "src")), Seq("src"), "left_anti")
      .join(broadcast(vDels.withColumnRenamed("id", "dst")), Seq("dst"), "left_anti")
      .select(col("src"), col("dst"))

    c.unpersist()
    (v1, e1)
  }

  /** Exact per-batch edge delta in CANONICAL UNDIRECTED space (lo < hi):
    * (added, deleted) with added = canon(after) \ canon(before) and deleted
    * = canon(before) \ canon(after) — but derived from the batch's own ops
    * via BROADCAST-only joins, never by anti-joining the full before/after
    * tables (the round-2 shape: two canon+distinct shuffles plus two full
    * anti-joins of E per micro-batch, O(|E|) shuffle work for an O(|Δ|)
    * answer — a scale-killer on a continuous stream).
    *
    * Candidate keys come from the RAW ops (not the compacted ones: a mid-
    * batch `-v` cascades deletions even when the vertex's compacted final op
    * is a re-add). Add/delete candidacy is NON-EXCLUSIVE: an edge is an add
    * candidate (isA) when it has an `e` op, and a delete candidate (isD)
    * when it has a `-e` op OR is incident to any `-v` vertex — one edge can
    * be both (e.g. before has (6,7); batch = [e 6 7, -v 7]: the duplicate
    * add must not mask the cascade delete). Each full table is scanned ONCE
    * with the tiny key set broadcast — no ShuffleExchange touches the edge
    * tables (asserted by UpdatesSpec); at warehouse scale the scan itself
    * prunes via bucketing/DPP on the key columns. */
  def edgeDelta(spark: SparkSession, before: DataFrame, after: DataFrame,
                batch: Dataset[GraphUpdate]): (DataFrame, DataFrame) = {
    import spark.implicits._
    def canonKeys(df: DataFrame): DataFrame = df.select(
      least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .where(col("lo") =!= col("hi")).distinct()

    val b = batch.toDF().localCheckpoint(true)
    val eAddKeys = canonKeys(b.where(col("op") === "e")
      .select(col("id1").as("src"), col("id2").as("dst")))
    val eDelKeys = canonKeys(b.where(col("op") === "-e")
      .select(col("id1").as("src"), col("id2").as("dst")))
    val vDelIds = b.where(col("op") === "-v").select(col("id1")).distinct()
      .as[Long].collect().toSeq

    // one row per candidate key carrying both flags (an edge can be an add
    // AND a delete candidate in the same batch — the flags are independent)
    val keys = eAddKeys.withColumn("kA", lit(true)).withColumn("kD", lit(false))
      .unionByName(eDelKeys.withColumn("kA", lit(false)).withColumn("kD", lit(true)))
      .groupBy(col("lo"), col("hi"))
      .agg(max(col("kA")).as("kA"), max(col("kD")).as("kD"))
      .localCheckpoint(true)

    def hits(t: DataFrame): DataFrame = {
      val s = t.select(least(col("src"), col("dst")).as("lo"),
          greatest(col("src"), col("dst")).as("hi"))
        .where(col("lo") =!= col("hi"))
      val incident =
        if (vDelIds.isEmpty) lit(false)
        else col("lo").isin(vDelIds: _*) || col("hi").isin(vDelIds: _*)
      s.join(broadcast(keys), Seq("lo", "hi"), "left_outer")
        .withColumn("isA", coalesce(col("kA"), lit(false)))
        .withColumn("isD", coalesce(col("kD"), lit(false)) || incident)
        .where(col("isA") || col("isD"))
        .select(col("lo"), col("hi"), col("isA"), col("isD"))
        .distinct() // tiny: bounded by |Δ| + deg(deleted vertices)
    }
    // no materialization: the hit sets are tiny and keeping them lazy keeps
    // the WHOLE derivation (scan → broadcast join → distinct-on-tiny →
    // broadcast anti-join) inspectable in one physical plan — DeltaSpec
    // asserts no SortMergeJoin/ShuffledHashJoin ever touches the edge tables
    val hb = hits(before)
    val ha = hits(after)
    val added = ha.where(col("isA")).select(col("lo"), col("hi"))
      .join(broadcast(hb.where(col("isA")).select(col("lo"), col("hi"))),
        Seq("lo", "hi"), "left_anti")
      .select(col("lo").as("src"), col("hi").as("dst"))
    val deleted = hb.where(col("isD")).select(col("lo"), col("hi"))
      .join(broadcast(ha.where(col("isD")).select(col("lo"), col("hi"))),
        Seq("lo", "hi"), "left_anti")
      .select(col("lo").as("src"), col("hi").as("dst"))
    (added, deleted)
  }

  /** DIRECTED per-batch edge delta — same broadcast-only derivation and
    * non-exclusive isA/isD classification as edgeDelta, but keys keep their
    * (src, dst) orientation (the PageRank maintenance path needs directed
    * deltas; canonicalizing would flip edges). */
  def edgeDeltaDirected(spark: SparkSession, before: DataFrame, after: DataFrame,
                        batch: Dataset[GraphUpdate]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val b = batch.toDF().localCheckpoint(true)
    def keysOf(op: String): DataFrame =
      b.where(col("op") === op)
        .select(col("id1").as("src"), col("id2").as("dst"))
        .where(col("src") =!= col("dst")).distinct()
    val vDelIds = b.where(col("op") === "-v").select(col("id1")).distinct()
      .as[Long].collect().toSeq

    val keys = keysOf("e").withColumn("kA", lit(true)).withColumn("kD", lit(false))
      .unionByName(keysOf("-e").withColumn("kA", lit(false)).withColumn("kD", lit(true)))
      .groupBy(col("src"), col("dst"))
      .agg(max(col("kA")).as("kA"), max(col("kD")).as("kD"))
      .localCheckpoint(true)

    def hits(t: DataFrame): DataFrame = {
      val s = t.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      val incident =
        if (vDelIds.isEmpty) lit(false)
        else col("src").isin(vDelIds: _*) || col("dst").isin(vDelIds: _*)
      s.join(broadcast(keys), Seq("src", "dst"), "left_outer")
        .withColumn("isA", coalesce(col("kA"), lit(false)))
        .withColumn("isD", coalesce(col("kD"), lit(false)) || incident)
        .where(col("isA") || col("isD"))
        .select(col("src"), col("dst"), col("isA"), col("isD"))
        .distinct()
    }
    val hb = hits(before)
    val ha = hits(after)
    val added = ha.where(col("isA")).select(col("src"), col("dst"))
      .join(broadcast(hb.where(col("isA")).select(col("src"), col("dst"))),
        Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst"))
    val deleted = hb.where(col("isD")).select(col("src"), col("dst"))
      .join(broadcast(ha.where(col("isD")).select(col("src"), col("dst"))),
        Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst"))
    (added, deleted)
  }

  /** applyBatch for LABELED graphs (the matching tier): vertices carry
    * vlabel, edges carry elabel. Same segmentation protocol as applyBatch;
    * vertex adds UPSERT the label (reference AddVertex, graph.cpp:23-49),
    * edge adds keep the existing row on duplicates (sorted-insert dedup,
    * graph.cpp:63-64). */
  def applyBatchLabeled(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                        batch: Dataset[GraphUpdate]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val vDelSeqs = batch.filter(_.op == "-v").select(col("seq")).as[Long]
      .collect().sorted
    val nOps = batch.count()
    if (vDelSeqs.isEmpty || nOps == vDelSeqs.length)
      applySegmentLabeled(spark, vertices, edges, batch)
    else {
      val bounds = vDelSeqs.map(Some(_)) :+ None
      var lo = Long.MinValue
      var (v, e) = (vertices, edges)
      bounds.foreach { hi =>
        val seg = hi match {
          case Some(s) => batch.filter(u => u.seq > lo && u.seq <= s)
          case None => batch.filter(u => u.seq > lo)
        }
        if (hi.isEmpty || hi.exists(_ > lo)) {
          val (v1, e1) = applySegmentLabeled(spark, v, e, seg)
          v = v1.localCheckpoint(true)
          e = e1.localCheckpoint(true)
        }
        hi.foreach(s => lo = s)
      }
      (v, e)
    }
  }

  private def applySegmentLabeled(spark: SparkSession, vertices: DataFrame,
                                  edges: DataFrame, batch: Dataset[GraphUpdate])
      : (DataFrame, DataFrame) = {
    val c = compact(batch).persist()
    val vAdds = c.where(col("op") === "v")
      .select(col("id1").as("id"), col("label").cast("int").as("vlabel"))
    val vDels = c.where(col("op") === "-v").select(col("id1").as("id"))
    val eAdds = c.where(col("op") === "e")
      .select(col("id1").as("src"), col("id2").as("dst"), col("label").cast("int").as("elabel"))
    val eDels = c.where(col("op") === "-e")
      .select(col("id1").as("src"), col("id2").as("dst"))

    val v1 = vertices.select(col("id"), col("vlabel"))
      .join(broadcast(vAdds.select(col("id"))), Seq("id"), "left_anti") // upsert: new label wins
      .union(vAdds)
      .join(broadcast(vDels), Seq("id"), "left_anti")

    // "existing row wins on duplicate add" via a delta-sized `present`
    // probe: a LeftAnti with the big edge table on the right cannot
    // broadcast-build (BuildRight only) and would silently shuffle E once
    // past the auto-broadcast threshold — instead stream E once against the
    // broadcast add keys and anti-join the adds against the tiny result
    val present = edges.select(col("src"), col("dst"))
      .join(broadcast(eAdds.select(col("src"), col("dst"))), Seq("src", "dst"), "left_semi")
    val e1 = edges.select(col("src"), col("dst"), col("elabel"))
      .union(eAdds.join(broadcast(present), Seq("src", "dst"), "left_anti"))
      .where(col("src") =!= col("dst"))
      .join(broadcast(eDels), Seq("src", "dst"), "left_anti")
      .join(broadcast(vDels.withColumnRenamed("id", "src")), Seq("src"), "left_anti")
      .join(broadcast(vDels.withColumnRenamed("id", "dst")), Seq("dst"), "left_anti")
      .select(col("src"), col("dst"), col("elabel")) // USING joins reorder — pin

    c.unpersist()
    (v1, e1)
  }

  /** Safe/unsafe classification for connected components: broadcast the
    * (small) per-batch update set against the label state — the
    * anti-join-before-heavy-work pattern (F2/F3). Returns the batch with a
    * `safe` column. */
  def classifyForCC(ccState: DataFrame, batch: Dataset[GraphUpdate]): DataFrame = {
    val lbl = ccState.select(col("id"), col("label"))
    val b = batch.toDF()
    val withL1 = b.join(lbl.withColumnRenamed("id", "id1").withColumnRenamed("label", "l1"),
      Seq("id1"), "left_outer")
    val withL2 = withL1.join(lbl.withColumnRenamed("id", "id2").withColumnRenamed("label", "l2"),
      Seq("id2"), "left_outer")
    withL2.withColumn("safe",
      (col("op") === "e" && col("l1").isNotNull && col("l1") === col("l2")) ||
        (col("op") === "v"))
      .select(col("seq"), col("op"), col("id1"), col("id2"), col("label"), col("safe"))
  }

  /** Incremental CC maintenance over one micro-batch:
    *  - all updates safe             → labels unchanged (zero supersteps);
    *  - adds only (some cross-label) → WARM start from previous labels
    *    (sound: each old label is the min id of its old component, so
    *    min-propagation from old labels converges to the min id of the
    *    merged component);
    *  - any delete                   → COLD recompute (splits invalidate
    *    old labels — the reference also routes deletes to full search).
    * Returns (newVertices, newEdges, ccResult, nSafe, nUnsafe). */
  def incrementalCC(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                    ccState: DataFrame, batch: Dataset[GraphUpdate])
      : (DataFrame, DataFrame, AlgoResult, Long, Long) = {
    import spark.implicits._
    val classified = classifyForCC(ccState, batch).persist()
    val nSafe = classified.where(col("safe")).count()
    val nUnsafe = classified.where(!col("safe")).count()
    val (v1, e1) = applyBatch(spark, vertices, edges, batch)
    val v1c = v1.localCheckpoint(true)
    val e1c = e1.localCheckpoint(true)

    val hasDelete = classified.where(col("op").isin("-v", "-e")).count() > 0
    val result =
      if (nUnsafe == 0) {
        // state unchanged except brand-new vertices get their own label
        val newV = v1c.join(ccState.select(col("id")), Seq("id"), "left_anti")
          .withColumn("label", col("id"))
        AlgoResult(ccState.union(newV), 0, Seq.empty)
      } else if (!hasDelete) {
        val cc = new ConnectedComponents(maxIter = 60)
        val warmInit = ccState.union(
          v1c.join(ccState.select(col("id")), Seq("id"), "left_anti")
            .withColumn("label", col("id")))
        cc.runFrom(spark, e1c, v1c, warmInit)
      } else {
        new ConnectedComponents(maxIter = 60).run(spark, e1c, v1c)
      }
    classified.unpersist()
    (v1c, e1c, result, nSafe, nUnsafe)
  }

  // ---------------------------------------------------------------------
  // DRIVER-LOCAL micro-batch fast path (the continuous tier's hot loop).
  //
  // A micro-batch is by definition tiny next to the graph, yet the
  // DataFrame derivations above cost a fixed ~15-20 Spark actions per
  // batch (each with scheduler + broadcast-build overhead) — measured to
  // dominate per-batch latency at any realistic window size. These
  // mirrors compute the SAME results with the batch collected once on the
  // driver: compaction/segmentation/delta candidacy are plain Scala over
  // |Δ| rows, the graph tables are touched only by (a) lazy overlay views
  // whose delta sides are LocalRelations (broadcast builds run on the
  // driver, zero jobs) and (b) ONE probe action for the before/after
  // candidate scan. Equivalence with the DataFrame path is test-pinned
  // (UpdatesLocalSpec).
  // ---------------------------------------------------------------------

  /** Driver-side mirror of `compact`: last op (max seq) per key. One
    * mutable-map pass (opt round 6): the old groupBy built a per-key Seq
    * and ran maxBy over it — measured 1.2s on a 160k-op window, a pure
    * driver-side term the micro-batch wall pays before any job starts. */
  def compactLocal(ops: Seq[GraphUpdate]): Seq[GraphUpdate] = {
    val m = new java.util.HashMap[(Boolean, Long, Long), GraphUpdate](ops.size * 2)
    ops.foreach { u =>
      val k = if (u.op == "e" || u.op == "-e") (true, u.id1, u.id2) else (false, u.id1, 0L)
      val prev = m.get(k)
      if (prev == null || u.seq > prev.seq) m.put(k, u)
    }
    import scala.jdk.CollectionConverters._
    m.values().asScala.toSeq.sortBy(_.seq)
  }

  /** Driver-side mirror of `applyBatchLabeled`'s segmentation: seq-ordered
    * segments split at each `-v` (the -v closes its segment). */
  def segmentsLocal(ops: Seq[GraphUpdate]): Seq[Seq[GraphUpdate]] = {
    val sorted = ops.sortBy(_.seq)
    val vDelSeqs = sorted.filter(_.op == "-v").map(_.seq)
    if (vDelSeqs.isEmpty || vDelSeqs.length == sorted.length) Seq(sorted)
    else {
      val segs = Seq.newBuilder[Seq[GraphUpdate]]
      var lo = Long.MinValue
      (vDelSeqs.map(Some(_)) :+ None).foreach { hi =>
        val seg = hi match {
          case Some(s) => sorted.filter(u => u.seq > lo && u.seq <= s)
          case None => sorted.filter(_.seq > lo)
        }
        if (seg.nonEmpty) segs += seg
        hi.foreach(s => lo = s)
      }
      segs.result()
    }
  }

  /** LAZY labeled batch application from a driver-collected batch — the
    * exact `applyBatchLabeled` algebra (per-segment compaction, upsert
    * vertex labels, keep-existing edge rows, cascade on -v) with ZERO
    * Spark actions: every segment delta is a LocalRelation and the result
    * stays a view over the input tables. The caller owns materialization
    * cadence (compact with localCheckpoint every K batches). */
  def applyBatchLabeledLocal(spark: SparkSession, vertices: DataFrame,
                             edges: DataFrame, ops: Seq[GraphUpdate])
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    var v = vertices.select(col("id"), col("vlabel"))
    var e = edges.select(col("src"), col("dst"), col("elabel"))
    segmentsLocal(ops).foreach { seg =>
      val c = compactLocal(seg)
      val vAdds = c.filter(_.op == "v").map(u => (u.id1, u.label))
      val vDels = c.filter(_.op == "-v").map(_.id1)
      val eAdds = c.filter(_.op == "e").map(u => (u.id1, u.id2, u.label))
      val eDels = c.filter(_.op == "-e").map(u => (u.id1, u.id2))

      if (vAdds.nonEmpty || vDels.nonEmpty) {
        val vAddDf = graft.util.DeltaDF.of(spark, vAdds, "id", "vlabel")
        val vDelDf = graft.util.DeltaDF.of(spark, vDels.map(Tuple1(_)), "id")
        var v1 = v
        if (vAdds.nonEmpty)
          v1 = v1.join(broadcast(vAddDf.select(col("id"))), Seq("id"), "left_anti")
            .union(vAddDf)
        if (vDels.nonEmpty)
          v1 = v1.join(broadcast(vDelDf), Seq("id"), "left_anti")
        v = v1
      }
      if (eAdds.nonEmpty || eDels.nonEmpty || vDels.nonEmpty) {
        var e1 = e
        if (eAdds.nonEmpty) {
          val eAddDf = graft.util.DeltaDF.of(spark,
            eAdds.filter(t => t._1 != t._2), "src", "dst", "elabel")
          // keep-existing-on-duplicate, broadcast-only: a LeftAnti with the
          // BIG table on the right cannot broadcast-build (BuildRight only),
          // so "adds not already present" is derived through a delta-sized
          // `present` probe: stream E once with the add keys broadcast, then
          // anti-join the adds against the (tiny) present set
          val present = e.join(broadcast(eAddDf.select(col("src"), col("dst"))),
            Seq("src", "dst"), "left_semi")
          e1 = e1.union(eAddDf.join(
            broadcast(present.select(col("src"), col("dst"))),
            Seq("src", "dst"), "left_anti"))
        }
        if (eDels.nonEmpty)
          e1 = e1.join(broadcast(graft.util.DeltaDF.of(spark, eDels, "src", "dst")),
            Seq("src", "dst"), "left_anti")
        if (vDels.nonEmpty) {
          val vDelDf = graft.util.DeltaDF.of(spark, vDels.map(Tuple1(_)), "id")
          e1 = e1
            .join(broadcast(vDelDf.withColumnRenamed("id", "src")), Seq("src"), "left_anti")
            .join(broadcast(vDelDf.withColumnRenamed("id", "dst")), Seq("dst"), "left_anti")
        }
        e = e1.select(col("src"), col("dst"), col("elabel"))
      }
    }
    (v, e)
  }

  /** Driver-side mirror of `applyBatch` (UNLABELED tier) with ZERO Spark
    * actions: same segmentation and per-segment algebra, with the
    * whole-table `distinct`/`dropDuplicates` replaced by the equivalent
    * anti-join-the-adds form (sound under the maintained no-duplicates
    * invariant, which `applyBatch` itself establishes). Strict-mode
    * validation is not mirrored (callers on the hot loop never use it). */
  def applyBatchUnlabeledLocal(spark: SparkSession, vertices: DataFrame,
                               edges: DataFrame, ops: Seq[GraphUpdate])
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    var v = vertices.select(col("id"))
    var e = edges.select(col("src"), col("dst"))
    segmentsLocal(ops).foreach { seg =>
      val c = compactLocal(seg)
      val vAdds = c.filter(_.op == "v").map(_.id1)
      val vDels = c.filter(_.op == "-v").map(_.id1)
      val eAdds = c.filter(_.op == "e").map(u => (u.id1, u.id2))
        .filter(t => t._1 != t._2)
      val eDels = c.filter(_.op == "-e").map(u => (u.id1, u.id2))

      // unlabeled rows ARE their keys, so upsert = delete-then-union — a
      // pure broadcast-anti + LocalRelation-union shape (the "append adds
      // not present" form would put the big table on an anti-join's right,
      // which cannot broadcast-build)
      if (vAdds.nonEmpty || vDels.nonEmpty) {
        var v1 = v
        if (vAdds.nonEmpty) {
          val vAddDf = graft.util.DeltaDF.of(spark, vAdds.map(Tuple1(_)), "id")
          v1 = v1.join(broadcast(vAddDf), Seq("id"), "left_anti").union(vAddDf)
        }
        if (vDels.nonEmpty)
          v1 = v1.join(broadcast(
            graft.util.DeltaDF.of(spark, vDels.map(Tuple1(_)), "id")), Seq("id"), "left_anti")
        v = v1
      }
      if (eAdds.nonEmpty || eDels.nonEmpty || vDels.nonEmpty) {
        var e1 = e
        if (eAdds.nonEmpty) {
          val eAddDf = graft.util.DeltaDF.of(spark, eAdds, "src", "dst")
          e1 = e1.join(broadcast(eAddDf), Seq("src", "dst"), "left_anti")
            .union(eAddDf)
        }
        if (eDels.nonEmpty)
          e1 = e1.join(broadcast(graft.util.DeltaDF.of(spark, eDels, "src", "dst")),
            Seq("src", "dst"), "left_anti")
        if (vDels.nonEmpty) {
          val vDelDf = graft.util.DeltaDF.of(spark, vDels.map(Tuple1(_)), "id")
          e1 = e1
            .join(broadcast(vDelDf.withColumnRenamed("id", "src")), Seq("src"), "left_anti")
            .join(broadcast(vDelDf.withColumnRenamed("id", "dst")), Seq("dst"), "left_anti")
        }
        e = e1.select(col("src"), col("dst"))
      }
    }
    (v, e)
  }

  /** Collected per-batch canonical edge delta + the labeled row slices, in
    * ONE Spark action. Same derivation as `edgeDelta` (candidate keys from
    * the RAW ops, non-exclusive isA/isD, `-v` incidence) but the before and
    * after tables are each scanned exactly once, in the same job, and the
    * |Δ|-bounded hit rows come back to the driver:
    *   added     = canon keys isA-hit in after and not in before
    *   deleted   = canon keys isD-hit in before and not in after
    *   addedRows = after rows (directed, labeled) whose key was added
    *   deletedRows = before rows whose key was deleted.  */
  final case class EdgeDeltaLocal(added: Seq[(Long, Long)], deleted: Seq[(Long, Long)],
                                  addedRows: Seq[(Long, Long, Int)],
                                  deletedRows: Seq[(Long, Long, Int)])

  def edgeDeltaCollected(spark: SparkSession, before: DataFrame, after: DataFrame,
                         ops: Seq[GraphUpdate]): EdgeDeltaLocal = {
    import spark.implicits._
    def canon(s: Long, d: Long): (Long, Long) = if (s < d) (s, d) else (d, s)
    val eAddKeys = ops.filter(_.op == "e").map(u => canon(u.id1, u.id2))
      .filter(k => k._1 != k._2).toSet
    val eDelKeys = ops.filter(_.op == "-e").map(u => canon(u.id1, u.id2))
      .filter(k => k._1 != k._2).toSet
    val vDelIds = ops.filter(_.op == "-v").map(_.id1).toSet
    if (eAddKeys.isEmpty && eDelKeys.isEmpty && vDelIds.isEmpty)
      return EdgeDeltaLocal(Nil, Nil, Nil, Nil)

    val keysDf = graft.util.DeltaDF.of(spark,
      (eAddKeys.map(k => (k._1, k._2, true, eDelKeys(k))) ++
        (eDelKeys -- eAddKeys).map(k => (k._1, k._2, false, true))).toSeq,
      "lo", "hi", "kA", "kD")
    def probe(t: DataFrame, side: String): DataFrame = {
      val s = t.select(col("src"), col("dst"), col("elabel"),
          least(col("src"), col("dst")).as("lo"),
          greatest(col("src"), col("dst")).as("hi"))
        .where(col("lo") =!= col("hi"))
      val incident =
        if (vDelIds.isEmpty) lit(false)
        else col("lo").isin(vDelIds.toSeq: _*) || col("hi").isin(vDelIds.toSeq: _*)
      s.join(broadcast(keysDf), Seq("lo", "hi"), "left_outer")
        .withColumn("isA", coalesce(col("kA"), lit(false)))
        .withColumn("isD", coalesce(col("kD"), lit(false)) || incident)
        .where(col("isA") || col("isD"))
        .select(lit(side).as("side"), col("src"), col("dst"), col("elabel"),
          col("lo"), col("hi"), col("isA"), col("isD"))
    }
    val rows = probe(before, "b").unionByName(probe(after, "f")).collect()
    def keysOf(side: String, flag: String): Set[(Long, Long)] =
      rows.iterator.filter(r => r.getString(0) == side &&
        r.getBoolean(if (flag == "A") 6 else 7))
        .map(r => (r.getLong(4), r.getLong(5))).toSet
    val added = keysOf("f", "A") -- keysOf("b", "A")
    val deleted = keysOf("b", "D") -- keysOf("f", "D")
    def rowsOf(side: String, keys: Set[(Long, Long)]): Seq[(Long, Long, Int)] =
      rows.iterator.filter(r => r.getString(0) == side &&
        keys((r.getLong(4), r.getLong(5))))
        .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    EdgeDeltaLocal(added.toSeq, deleted.toSeq,
      rowsOf("f", added), rowsOf("b", deleted))
  }

  /** ONE-scan fast path for PURE-EDGE batches (every op is e/-e): probes
    * `edges` once with the batch's canonical candidate keys broadcast and
    * derives BOTH the collected delta (exact `edgeDeltaCollected`
    * semantics) and the after-view (exact `applyBatchLabeledLocal` algebra:
    * keep-existing adds by directed key, directed deletes) from the hit
    * rows. The general composition streams E three times inside the delta
    * probe action — the before scan, the after scan through the overlay,
    * and the keep-existing `present` subquery's broadcast build — where one
    * scan determines everything: the after side of every candidate key is
    * driver-computable from the before hits plus the (driver-known) batch.
    * Returns (afterView, delta); the view's delta sides are LocalRelations
    * (zero further actions). */
  def pureEdgeBatchLocal(spark: SparkSession, edges: DataFrame,
                         ops: Seq[GraphUpdate]): (DataFrame, EdgeDeltaLocal) = {
    val (e1, d, _) = pureEdgeBatchLabeled(spark, edges, None, ops)
    (e1, d)
  }

  /** `pureEdgeBatchLocal` with the endpoint-label probe FOLDED into the
    * same single action: when `vertices` is given, the probe plan unions
    * the E candidate-key scan with a V semi-join over every id the batch's
    * ops mention (a superset of the delta's endpoints — sound, extra
    * labels are simply unused), and the third return value maps id →
    * vlabel for every such id present in V. The continuous tier's
    * pure-edge batches drop from two probe actions to one. */
  // builder-side sub-phase trace (GRAFT_BATCH_TRACE=1), shared format with
  // MultiQueryDriver/SJTreeState
  private val peTrace: Boolean = sys.env.get("GRAFT_BATCH_TRACE").contains("1")
  private var peT0 = 0L
  private def petr(phase: String): Unit = if (peTrace) {
    val now = System.nanoTime()
    System.err.println(f"    [petrace] $phase%-20s ${(now - peT0) / 1e9}%6.3fs")
    peT0 = now
  }

  def pureEdgeBatchLabeled(spark: SparkSession, edges: DataFrame,
                           vertices: Option[DataFrame], ops: Seq[GraphUpdate])
      : (DataFrame, EdgeDeltaLocal, Map[Long, Int]) = {
    import spark.implicits._
    peT0 = System.nanoTime()
    require(ops.forall(o => o.op == "e" || o.op == "-e"), "pure-edge batches only")
    def canon(s: Long, d: Long): (Long, Long) = if (s < d) (s, d) else (d, s)
    // flags come from the RAW ops (edgeDeltaCollected's candidate sets);
    // the view algebra uses the COMPACTED ops (applyBatchLabeledLocal's)
    val rawAddK = ops.filter(_.op == "e").map(u => canon(u.id1, u.id2))
      .filter(k => k._1 != k._2).toSet
    val rawDelK = ops.filter(_.op == "-e").map(u => canon(u.id1, u.id2))
      .filter(k => k._1 != k._2).toSet
    petr("raw key sets")
    val e = edges.select(col("src"), col("dst"), col("elabel"))
    if (rawAddK.isEmpty && rawDelK.isEmpty) {
      // batch held only SELF-LOOP ops: no canonical delta (self-loops never
      // participate in matching), but applyBatchLabeledLocal applies the
      // compacted -e keys UNFILTERED — a '-e a a' must still delete a
      // pre-existing self-loop row from E (self-loop adds are dropped there
      // too, so only the delete side can act)
      val delSelf = compactLocal(ops).filter(_.op == "-e")
        .map(u => (u.id1, u.id2)).filter(t => t._1 == t._2)
      val e1 =
        if (delSelf.isEmpty) e
        else e.join(broadcast(delSelf.toDF("src", "dst")),
          Seq("src", "dst"), "left_anti")
      // empty delta: the caller short-circuits before consulting labels
      return (e1, EdgeDeltaLocal(Nil, Nil, Nil, Nil), Map.empty)
    }

    val c = compactLocal(ops)
    petr("compactLocal")
    val addRows = c.filter(_.op == "e").map(u => (u.id1, u.id2, u.label))
      .filter(t => t._1 != t._2)
    val delDirected = c.filter(_.op == "-e").map(u => (u.id1, u.id2)).toSet
    petr("add/del rows")

    // the ONE probe action: E rows whose canonical key is a candidate,
    // unioned (when a vertex table rides along) with the V label probe
    val keysDf = graft.util.DeltaDF.of(spark, (rawAddK ++ rawDelK).toSeq, "lo", "hi")
    val eProbe = e.where(col("src") =!= col("dst"))
      .join(broadcast(keysDf),
        least(col("src"), col("dst")) === col("lo") &&
          greatest(col("src"), col("dst")) === col("hi"), "left_semi")
      .select(lit(false).as("isV"), col("src").as("a"), col("dst").as("b"),
        col("elabel").as("l"))
    val probe = vertices match {
      case Some(v) =>
        val ids = ops.flatMap(u => Seq(u.id1, u.id2)).distinct
        val vProbe = v
          .join(broadcast(graft.util.DeltaDF.of(spark, ids.map(Tuple1(_)), "id")),
            Seq("id"), "left_semi")
          .select(lit(true).as("isV"), col("id").as("a"), col("id").as("b"),
            col("vlabel").as("l"))
        eProbe.unionByName(vProbe)
      case None => eProbe
    }
    petr("probe plan build")
    val probeRows = probe.collect()
    petr("probe collect (action)")
    val hits = probeRows.iterator.filter(!_.getBoolean(0))
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val labels: Map[Long, Int] = probeRows.iterator.filter(_.getBoolean(0))
      .map(r => r.getLong(1) -> r.getInt(3)).toMap

    val presentDirected = hits.map(t => (t._1, t._2)).toSet
    val newRows = addRows.filterNot(t => presentDirected((t._1, t._2)))
    // after-side candidate rows, driver-derived: surviving before hits plus
    // the new adds (adds-then-deletes order, matching the view below)
    val afterHits = (hits ++ newRows).filterNot(t => delDirected((t._1, t._2)))
    def keysOf(rows: Seq[(Long, Long, Int)], flags: Set[(Long, Long)]) =
      rows.iterator.map(t => canon(t._1, t._2)).filter(flags).toSet
    val added = keysOf(afterHits, rawAddK) -- keysOf(hits, rawAddK)
    val deleted = keysOf(hits, rawDelK) -- keysOf(afterHits, rawDelK)
    val addedRows = afterHits.filter(t => added(canon(t._1, t._2)))
    val deletedRows = hits.filter(t => deleted(canon(t._1, t._2)))
    petr("delta derivation")

    var e1 = if (newRows.isEmpty) e
      else e.union(graft.util.DeltaDF.of(spark, newRows, "src", "dst", "elabel"))
    if (delDirected.nonEmpty)
      e1 = e1.join(broadcast(
          graft.util.DeltaDF.of(spark, delDirected.toSeq, "src", "dst")),
        Seq("src", "dst"), "left_anti")
    petr("after view build")
    (e1.select(col("src"), col("dst"), col("elabel")),
      EdgeDeltaLocal(added.toSeq, deleted.toSeq, addedRows, deletedRows), labels)
  }

  /** Keys-only collected canonical delta for UNLABELED edge tables — the
    * `edgeDelta` derivation in one probe action, result collected. */
  def edgeDeltaKeysCollected(spark: SparkSession, before: DataFrame, after: DataFrame,
                             ops: Seq[GraphUpdate])
      : (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val d = edgeDeltaCollected(spark,
      before.select(col("src"), col("dst")).withColumn("elabel", lit(0)),
      after.select(col("src"), col("dst")).withColumn("elabel", lit(0)), ops)
    (d.added, d.deleted)
  }

  /** DIRECTED collected delta (the PageRank maintenance path): mirror of
    * `edgeDeltaDirected` — keys keep orientation, candidacy from the RAW
    * ops, non-exclusive isA/isD, `-v` incidence — one probe action over
    * before and after, hits collected. */
  def edgeDeltaDirectedCollected(spark: SparkSession, before: DataFrame,
                                 after: DataFrame, ops: Seq[GraphUpdate])
      : (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    import spark.implicits._
    val eAddKeys = ops.filter(_.op == "e").map(u => (u.id1, u.id2))
      .filter(k => k._1 != k._2).toSet
    val eDelKeys = ops.filter(_.op == "-e").map(u => (u.id1, u.id2))
      .filter(k => k._1 != k._2).toSet
    val vDelIds = ops.filter(_.op == "-v").map(_.id1).toSet
    if (eAddKeys.isEmpty && eDelKeys.isEmpty && vDelIds.isEmpty)
      return (Nil, Nil)
    val keysDf = graft.util.DeltaDF.of(spark,
      (eAddKeys.map(k => (k._1, k._2, true, eDelKeys(k))) ++
        (eDelKeys -- eAddKeys).map(k => (k._1, k._2, false, true))).toSeq,
      "src", "dst", "kA", "kD")
    def probe(t: DataFrame, side: String): DataFrame = {
      val s = t.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      val incident =
        if (vDelIds.isEmpty) lit(false)
        else col("src").isin(vDelIds.toSeq: _*) || col("dst").isin(vDelIds.toSeq: _*)
      s.join(broadcast(keysDf), Seq("src", "dst"), "left_outer")
        .withColumn("isA", coalesce(col("kA"), lit(false)))
        .withColumn("isD", coalesce(col("kD"), lit(false)) || incident)
        .where(col("isA") || col("isD"))
        .select(lit(side).as("side"), col("src"), col("dst"), col("isA"), col("isD"))
    }
    val rows = probe(before, "b").unionByName(probe(after, "f")).collect()
    def keysOf(side: String, idx: Int): Set[(Long, Long)] =
      rows.iterator.filter(r => r.getString(0) == side && r.getBoolean(idx))
        .map(r => (r.getLong(1), r.getLong(2))).toSet
    val added = (keysOf("f", 3) -- keysOf("b", 3)).toSeq
    val deleted = (keysOf("b", 4) -- keysOf("f", 4)).toSeq
    (added, deleted)
  }
}
