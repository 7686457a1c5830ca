package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over per-partition CSR blocks — the reference's packed
  * adjacency-array layout (ParaCOSM/CSM/graph/graph.h:63-75: parallel sorted
  * primitive vectors per vertex) reborn as a block-partitioned Dataset, per
  * the north star's "salted, range-partitioned edge Dataset with
  * per-partition CSR blocks".
  *
  * Layout (all typed Datasets, no RDD API):
  *  - vertices are hash-assigned to P blocks (pid = xxhash64(id) mod P) and
  *    indexed densely within their block (idx = rank of id in block);
  *  - `GraphBlock(pid)` packs the block's out-edges as primitive arrays
  *    (srcIdx, dstPid, dstIdx) SORTED by (dstPid, dstIdx), plus the per-
  *    vertex outDeg array — built once, checkpointed, reused every superstep;
  *  - `RankBlock(pid)` is the superstep state: one double per vertex plus
  *    the static dangling flags, re-checkpointed per superstep.
  *
  * Superstep = joinWith(blocks, state) → flatMap emitting PRE-AGGREGATED
  * sparse messages (one (idx[], sum[]) pair per destination block — the
  * dst-sorted edge layout makes per-destination accumulation a streaming
  * run-length pass, no hash map) → cogroup(state) merging messages into the
  * next rank vector and computing per-block delta norms + dangling mass in
  * the same pass.
  *
  * Why this beats the row-at-a-time Dataset join at scale: the shuffle
  * carries ≤ one entry per (srcBlock, dst) pair in packed primitive arrays
  * (≈12 B/entry, map-side combined) instead of one Tungsten row per edge,
  * and the per-superstep CPU is tight array arithmetic instead of hash-join
  * probes — the same argument the reference makes for CSR adjacency over
  * pointer-chasing (SURVEY.md §1.3). Agreement with the Dataset-join
  * PageRank within 1e-6 is the cross-implementation oracle (SURVEY.md §5).
  */
object CsrPageRank {

  final case class GraphBlock(
      pid: Int,
      outDeg: Array[Int],                 // per block-vertex, idx-aligned
      edgeSrcIdx: Array[Int],             // edges sorted by (dstPid, dstIdx)
      edgeDstPid: Array[Int],
      edgeDstIdx: Array[Int])

  final case class VertsBlock(pid: Int, ids: Array[Long])

  final case class RankBlock(
      pid: Int,
      ranks: Array[Double],
      dangling: Array[Boolean],
      danglingMass: Double,               // of THIS block's current ranks
      deltaL1: Double,
      deltaLinf: Double)

  final case class Msg(pid: Int, srcPid: Int, idx: Array[Int], sums: Array[Double])

  final case class Blocks(graph: Dataset[GraphBlock], verts: Option[Dataset[VertsBlock]],
                          init: Dataset[RankBlock], n: Long, p: Int) {
    /** Fail-fast accessor: a bench-path load (loadForBench) carries no
      * vertex-id arrays — silently joining an empty verts table would
      * produce an empty result instead of an error (round-3 advice). */
    def vertsOrFail: Dataset[VertsBlock] = verts.getOrElse(throw new IllegalStateException(
      "Blocks were loaded without vertex ids (loadForBench) — toRows/save need load()/build()"))
  }

  /** One-time build: index vertices, pack edges into blocks. Three shuffles
    * total (vertex indexing, edge placement, block packing) — amortized over
    * every subsequent superstep. */
  def build(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
            blockPOverride: Option[Int] = None): Blocks = {
    import spark.implicits._
    val maxP = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val vDistinct = vertices.select(col("id")).distinct().localCheckpoint(true)
    val nVerts = vDistinct.count()
    // SCALE-ADAPTIVE block count (opt round 6, guide §2: derive partitioning
    // from input size, not a constant): ~64k vertices per block, capped at
    // the session's shuffle parallelism. A small graph (the sf-scale bench
    // inputs) collapses to a handful of blocks — every superstep's fixed
    // per-block coordination (32 near-empty shuffle blocks, 32-task
    // cogroups) was the dominant term there — while at warehouse scale the
    // cap keeps the old behavior (p = shuffle.partitions). Results are
    // unchanged: block count only regroups the float accumulation, and the
    // 8-decimal rounding contract already absorbs a completely different
    // summation order (the DuckDB oracle's).
    // divisor tuned by A/B at sf0.1 (587k-edge procurement graph): P=4 beat
    // both P=32 (2× slower: near-empty per-superstep shuffle blocks) and
    // P=1 (loses all superstep parallelism) — ~4k vertices/block keeps a
    // few busy blocks on small graphs and the maxP cap binds for anything
    // ≥ 131k vertices, reproducing the old behavior at scale
    val p = blockPOverride.getOrElse(
      math.max(1, math.min(maxP, ((nVerts + 4095) / 4096).toInt)))

    // (id, pid, idx): dense index within block, ordered by id for determinism
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("id"))
    val vIdx = vDistinct
      .withColumn("pid", pmod(xxhash64(col("id")), lit(p.toLong)).cast("int"))
      .withColumn("idx", (row_number().over(w) - 1).cast("int"))
      .localCheckpoint(true)
    val n = nVerts

    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).cast("int").as("deg"))

    // per-vertex static arrays (ids, outDeg) packed per block
    val vertRows = vIdx.join(outDeg, vIdx("id") === outDeg("src"), "left_outer")
      .select(col("pid"), col("idx"), col("id"), coalesce(col("deg"), lit(0)).as("deg"))
      .repartition(p, col("pid"))
      .sortWithinPartitions("pid", "idx")
    val verts = vertRows.select("pid", "idx", "id", "deg")
      .as[(Int, Int, Long, Int)]
      .mapPartitions { rows =>
        packRuns(rows.map { case (pid, _, id, deg) => (pid, (id, deg)) })
          .map { case (pid, xs) => (pid, xs.map(_._1).toArray, xs.map(_._2).toArray) }
      }.localCheckpoint(true)

    // edges with both endpoints resolved to (pid, idx)
    val srcRef = vIdx.select(col("id").as("src"), col("pid").as("srcPid"), col("idx").as("srcIdx"))
    val dstRef = vIdx.select(col("id").as("dst"), col("pid").as("dstPid"), col("idx").as("dstIdx"))
    val eRef = edges.select(col("src"), col("dst"))
      .join(srcRef.hint("shuffle_hash"), "src")
      .join(dstRef.hint("shuffle_hash"), "dst")
      .select(col("srcPid"), col("srcIdx"), col("dstPid"), col("dstIdx"))
      .repartition(p, col("srcPid"))
      .sortWithinPartitions("srcPid", "dstPid", "dstIdx")

    val edgeBlocks = eRef.as[(Int, Int, Int, Int)]
      .mapPartitions { rows =>
        packRuns(rows.map { case (sp, si, dp, di) => (sp, (si, dp, di)) })
          .map { case (pid, xs) =>
            (pid, xs.map(_._1).toArray, xs.map(_._2).toArray, xs.map(_._3).toArray)
          }
      }

    // merge vertex arrays + edge arrays into GraphBlock (some blocks may
    // have no edges → left_outer from verts)
    val vDF = verts.toDF("pid", "ids", "degs")
    val eDF2 = edgeBlocks.toDF("pid", "eSrcIdx", "eDstPid", "eDstIdx")
    val graph = vDF.join(eDF2, Seq("pid"), "left_outer")
      .select(col("pid"), col("degs"), col("eSrcIdx"), col("eDstPid"), col("eDstIdx"))
      .as[(Int, Array[Int], Option[Array[Int]], Option[Array[Int]], Option[Array[Int]])]
      .map { case (pid, degs, si, dp, di) =>
        GraphBlock(pid, degs,
          si.getOrElse(Array.emptyIntArray),
          dp.getOrElse(Array.emptyIntArray),
          di.getOrElse(Array.emptyIntArray))
      }
      .repartition(p, col("pid"))
      .localCheckpoint(true)

    val n0 = n.toDouble
    val init = verts.map { case (pid, ids, degs) =>
      val ranks = Array.fill(ids.length)(1.0 / n0)
      val dang = degs.map(_ == 0)
      val dm = dang.count(identity) * (1.0 / n0)
      RankBlock(pid, ranks, dang, dm, 0.0, 0.0)
    }.repartition(p, col("pid")).localCheckpoint(true)

    val vertsDs = verts.map { case (pid, ids, _) => VertsBlock(pid, ids) }
      .localCheckpoint(true)

    Blocks(graph, Some(vertsDs), init, n, p)
  }

  /** Fast-path build for DENSE vertex ids in [0, nVerts): pid = id mod P,
    * idx = id div P — arithmetic indexing, so the whole build is ONE shuffle
    * (edge placement) with outDeg accumulated in the same partition pass.
    * Used by the bench harness; `build` is the general-id path. */
  def buildDense(spark: SparkSession, edges: DataFrame, nVerts: Long): Blocks = {
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val n0 = nVerts.toDouble

    def nVertsOf(pid: Int): Int =
      ((nVerts - pid + p - 1) / p).toInt // count of ids ≡ pid (mod p) below nVerts

    val eRef = edges
      .select((col("src") % p).cast("int").as("srcPid"),
        (col("src") / p).cast("int").as("srcIdx"),
        (col("dst") % p).cast("int").as("dstPid"),
        (col("dst") / p).cast("int").as("dstIdx"))
      .repartition(p, col("srcPid"))
      .sortWithinPartitions("srcPid", "dstPid", "dstIdx")

    val graph = eRef.as[(Int, Int, Int, Int)]
      .mapPartitions { rows =>
        packRuns(rows.map { case (sp, si, dp, di) => (sp, (si, dp, di)) })
          .map { case (pid, xs) =>
            val deg = new Array[Int](nVertsOf(pid))
            xs.foreach { case (si, _, _) => deg(si) += 1 }
            GraphBlock(pid, deg, xs.map(_._1).toArray, xs.map(_._2).toArray,
              xs.map(_._3).toArray)
          }
      }
    // blocks with no out-edges at all still need rows (all-dangling)
    val allPids = spark.range(0, p).select(col("id").cast("int").as("pid"))
    val graphAll = allPids.joinWith(graph, allPids("pid") === graph("pid"), "left_outer")
      .map { case (row, g) =>
        val pid = row.getInt(0)
        if (g != null) g
        else GraphBlock(pid, new Array[Int](nVertsOf(pid)),
          Array.emptyIntArray, Array.emptyIntArray, Array.emptyIntArray)
      }
      .repartition(p, col("pid")).localCheckpoint(true)

    val init = graphAll.map { g =>
      val nV = g.outDeg.length
      val ranks = Array.fill(nV)(1.0 / n0)
      val dang = g.outDeg.map(_ == 0)
      RankBlock(g.pid, ranks, dang, dang.count(identity) * (1.0 / n0), 0.0, 0.0)
    }.repartition(p, col("pid")).localCheckpoint(true)

    val verts = graphAll.map { g =>
      VertsBlock(g.pid, Array.tabulate(g.outDeg.length)(i => i.toLong * p + g.pid))
    }.localCheckpoint(true)

    Blocks(graphAll, Some(verts), init, nVerts, p)
  }

  /** Group consecutive runs of a sorted (key, payload) iterator. */
  private def packRuns[T](rows: Iterator[(Int, T)]): Iterator[(Int, Vector[T])] =
    new Iterator[(Int, Vector[T])] {
      private val it = rows.buffered
      def hasNext: Boolean = it.hasNext
      def next(): (Int, Vector[T]) = {
        val pid = it.head._1
        val b = Vector.newBuilder[T]
        while (it.hasNext && it.head._1 == pid) b += it.next()._2
        (pid, b.result())
      }
    }

  /** Persist built blocks (packed parquet) so the same input can be re-run
    * at several parallelism levels — the cluster-size comparison reads one
    * artifact, like a real N-vs-4N executor test reads one table. */
  def save(blocks: Blocks, path: String): Unit = {
    blocks.graph.write.mode("overwrite").parquet(s"$path/graph")
    blocks.vertsOrFail.write.mode("overwrite").parquet(s"$path/verts")
    blocks.init.write.mode("overwrite").parquet(s"$path/init")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path, "meta.json"),
      s"""{"n":${blocks.n},"p":${blocks.p}}""")
  }

  def load(spark: SparkSession, path: String): Blocks =
    loadImpl(spark, path, withVerts = true)

  /** Bench-path load: the superstep kernel never touches the vertex-id
    * arrays, and materializing them is ~1/3 of a level session's load time
    * at low core counts. */
  def loadForBench(spark: SparkSession, path: String): Blocks =
    loadImpl(spark, path, withVerts = false)

  private def loadImpl(spark: SparkSession, path: String, withVerts: Boolean): Blocks = {
    import spark.implicits._
    val meta = java.nio.file.Files.readString(java.nio.file.Paths.get(path, "meta.json"))
    val n = """"n":(\d+)""".r.findFirstMatchIn(meta).get.group(1).toLong
    val p = """"p":(\d+)""".r.findFirstMatchIn(meta).get.group(1).toInt
    Blocks(
      spark.read.parquet(s"$path/graph").as[GraphBlock]
        .repartition(p, col("pid")).localCheckpoint(true),
      if (withVerts) Some(spark.read.parquet(s"$path/verts").as[VertsBlock]
        .repartition(p, col("pid")).localCheckpoint(true))
      else None,
      spark.read.parquet(s"$path/init").as[RankBlock]
        .repartition(p, col("pid")).localCheckpoint(true),
      n, p)
  }

  /** Run to convergence (L∞ < tol). Returns (state, iterations, metrics). */
  def run(spark: SparkSession, blocks: Blocks, damping: Double = 0.85,
          tol: Double = 1e-6, maxIter: Int = 100): (Dataset[RankBlock], Int, Seq[SuperstepMetrics]) = {
    import spark.implicits._
    val n = blocks.n.toDouble
    var state = blocks.init
    var danglingMass = state.toDF().agg(sum("danglingMass")).head().getDouble(0)
    var it = 0
    var linf = Double.MaxValue
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]

    var chkPrev: Dataset[RankBlock] = null
    while (it < maxIter && linf >= tol) {
      val t0 = System.nanoTime()
      // LAZY checkpoint: the metrics aggregate below is the superstep's ONE
      // action — it materializes the checkpoint blocks and computes the
      // norms/dangling sums in the same job (an eager checkpoint + separate
      // agg costs a second job per superstep; at bench scale that fixed
      // overhead was the dominant anti-scaling term)
      val chk = superstep(spark, blocks.graph, state, danglingMass, damping, n)
        .localCheckpoint(eager = false)
      val row = chk.toDF().agg(
        sum("deltaL1"), max("deltaLinf"), sum("danglingMass")).head()
      val l1 = row.getDouble(0)
      linf = row.getDouble(1)
      danglingMass = row.getDouble(2)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      it += 1
      metrics += SuperstepMetrics(it, wallMs, blocks.n, l1, linf, 0L)
      if (chkPrev != null) chkPrev.unpersist()
      chkPrev = chk
      // Clear the origin stats the checkpoint copies into the LogicalRDD:
      // the message stream and the merge both derive from state, so the
      // size-only estimate would otherwise SQUARE per superstep and the
      // driver melts in BigInteger.multiply by ~iteration 20 (observed
      // directly via jstack). The shim also preserves the physical
      // partitioning — cheap insurance even though cogroup's synthesized
      // grouping key forces its own exchange.
      state = org.apache.spark.sql.execution.GraftShims
        .freshStatsPreservePartitioning(chk)
    }
    (state, it, metrics.toSeq)
  }

  /** One superstep over blocks. An alternative "exchange-free" formulation
    * (state kept hash-partitioned by pid, messages collect_list'ed and
    * merged via co-partitioned left-outer joins) was measured 37% SLOWER at
    * every parallelism level — materializing each block's in-messages as
    * one ~32 MB Tungsten array value costs more than the state exchange it
    * saves — so the shipped shape is joinWith + cogroup, with the state
    * shuffle accepted as part of C (it parallelizes; at 80M vertices the
    * whole state is ~700 MB against a ~2 GB message exchange). */
  def superstep(spark: SparkSession, graph: Dataset[GraphBlock],
                state: Dataset[RankBlock], danglingMass: Double,
                damping: Double, n: Double): Dataset[RankBlock] = {
    import spark.implicits._
    val base = (1.0 - damping) / n + damping * danglingMass / n

    val msgs: Dataset[Msg] = graph
      .joinWith(state, graph("pid") === state("pid"))
      .flatMap { case (g, r) =>
        // per-source contribution = rank/outDeg (0 for dangling)
        val contrib = new Array[Double](g.outDeg.length)
        var i = 0
        while (i < contrib.length) {
          if (g.outDeg(i) > 0) contrib(i) = r.ranks(i) / g.outDeg(i)
          i += 1
        }
        // stream dst-sorted edges: one sparse message per destination block,
        // consecutive same-dst entries collapse (map-side combine)
        val out = Vector.newBuilder[Msg]
        val m = g.edgeSrcIdx.length
        var e = 0
        while (e < m) {
          val dPid = g.edgeDstPid(e)
          val idxB = Array.newBuilder[Int]
          val sumB = Array.newBuilder[Double]
          while (e < m && g.edgeDstPid(e) == dPid) {
            val dIdx = g.edgeDstIdx(e)
            var s = 0.0
            while (e < m && g.edgeDstPid(e) == dPid && g.edgeDstIdx(e) == dIdx) {
              s += contrib(g.edgeSrcIdx(e))
              e += 1
            }
            idxB += dIdx
            sumB += s
          }
          out += Msg(dPid, g.pid, idxB.result(), sumB.result())
        }
        out.result()
      }

    msgs.groupByKey(_.pid).cogroup(state.groupByKey(_.pid)) { (pid, ms, rs) =>
      val prev = rs.next()
      val nV = prev.ranks.length
      val acc = new Array[Double](nV)
      // sort in-messages by source block before accumulating: float
      // addition order is then deterministic across runs AND parallelism
      // levels (north-rule determinism), not shuffle-arrival order
      ms.toArray.sortBy(_.srcPid).foreach { msg =>
        var i = 0
        while (i < msg.idx.length) { acc(msg.idx(i)) += msg.sums(i); i += 1 }
      }
      val ranks = new Array[Double](nV)
      var dm = 0.0; var l1 = 0.0; var linf = 0.0
      var i = 0
      while (i < nV) {
        val v = base + damping * acc(i)
        ranks(i) = v
        if (prev.dangling(i)) dm += v
        val d = math.abs(v - prev.ranks(i))
        l1 += d
        if (d > linf) linf = d
        i += 1
      }
      Iterator.single(RankBlock(pid, ranks, prev.dangling, dm, l1, linf))
    }
  }

  /** pid-identity partitioner: block pid IS the partition index. */
  private final class PidPartitioner(p: Int) extends org.apache.spark.Partitioner {
    def numPartitions: Int = p
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
    override def equals(o: Any): Boolean = o match {
      case x: PidPartitioner => x.numPartitions == p
      case _ => false
    }
    override def hashCode: Int = p
  }

  /** The SAME superstep recurrence with the iteration loop on co-partitioned
    * RDDs instead of Dataset joins — the one measured place where Catalyst
    * is a per-iteration cost, not a benefit: with the Dataset loop, each
    * superstep re-analyzes/optimizes a fresh joinWith+cogroup plan
    * (new LogicalRDD leaves every iteration), measured at ~1.4 s/superstep
    * of driver wall (BenchLevel GRAFT_LEVEL_DEBUG: wall−jobMs) — a fixed
    * serial term that alone caps 2→8-core scaling efficiency at ~0.69 on
    * the 171M-edge artifact no matter how well the kernel scales. The
    * north rule's "no RDD unless forced" is met with receipts: the data
    * model, build, save/load and readback stay Datasets; only the loop
    * drops to co-partitioned `join`/`cogroup` (both narrow — the ONE
    * shuffle per superstep is the message exchange, exactly as before) with
    * the identical per-block kernel, so results agree bit-for-bit with the
    * Dataset loop (pinned by CsrPageRankSpec).
    *
    * Stats come from ONE `aggregate` action per superstep (materializes the
    * persisted next state and folds dangling/L1/L∞ in the same job — no
    * accumulators, so task retries cannot corrupt the recurrence). */
  def runPacked(spark: SparkSession, blocks: Blocks, damping: Double = 0.85,
                tol: Double = 1e-6, maxIter: Int = 100)
      : (Dataset[RankBlock], Int, Seq[SuperstepMetrics]) = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val n = blocks.n.toDouble
    val p = blocks.p
    val part = new PidPartitioner(p)

    val graphR = blocks.graph.rdd.map(g => (g.pid, g))
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var state = blocks.init.rdd.map(r => (r.pid, r))
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var danglingMass = state.map(_._2.danglingMass).sum()

    var it = 0
    var linf = Double.MaxValue
    val metrics = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]
    while (it < maxIter && linf >= tol) {
      val t0 = System.nanoTime()
      val base = (1.0 - damping) / n + damping * danglingMass / n
      val damp = damping
      val msgs = graphR.join(state, part) // co-partitioned: narrow
        .flatMap { case (_, (g, r)) =>
          val contrib = new Array[Double](g.outDeg.length)
          var i = 0
          while (i < contrib.length) {
            if (g.outDeg(i) > 0) contrib(i) = r.ranks(i) / g.outDeg(i)
            i += 1
          }
          val out = Vector.newBuilder[(Int, Msg)]
          val m = g.edgeSrcIdx.length
          var e = 0
          while (e < m) {
            val dPid = g.edgeDstPid(e)
            val idxB = Array.newBuilder[Int]
            val sumB = Array.newBuilder[Double]
            while (e < m && g.edgeDstPid(e) == dPid) {
              val dIdx = g.edgeDstIdx(e)
              var s = 0.0
              while (e < m && g.edgeDstPid(e) == dPid && g.edgeDstIdx(e) == dIdx) {
                s += contrib(g.edgeSrcIdx(e))
                e += 1
              }
              idxB += dIdx
              sumB += s
            }
            out += ((dPid, Msg(dPid, g.pid, idxB.result(), sumB.result())))
          }
          out.result()
        }
        .partitionBy(part) // THE shuffle of the superstep
      val newState = state.cogroup(msgs, part) // narrow on both sides
        .mapValues { case (rs, ms) =>
          val prev = rs.head
          val nV = prev.ranks.length
          val acc = new Array[Double](nV)
          // deterministic accumulation order (sort by source block), same
          // as the Dataset loop — floats agree across runs AND loops
          ms.toArray.sortBy(_.srcPid).foreach { msg =>
            var i = 0
            while (i < msg.idx.length) { acc(msg.idx(i)) += msg.sums(i); i += 1 }
          }
          val ranks = new Array[Double](nV)
          var dm = 0.0; var l1 = 0.0; var lf = 0.0
          var i = 0
          while (i < nV) {
            val v = base + damp * acc(i)
            ranks(i) = v
            if (prev.dangling(i)) dm += v
            val d = math.abs(v - prev.ranks(i))
            l1 += d
            if (d > lf) lf = d
            i += 1
          }
          RankBlock(prev.pid, ranks, prev.dangling, dm, l1, lf)
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (it % 25 == 24) newState.localCheckpoint() // bound RDD lineage depth
      val (dm, l1, lf) = newState.aggregate((0.0, 0.0, 0.0))(
        { case ((a, b, c), (_, r)) =>
          (a + r.danglingMass, b + r.deltaL1, math.max(c, r.deltaLinf)) },
        { case ((a1, b1, c1), (a2, b2, c2)) => (a1 + a2, b1 + b2, math.max(c1, c2)) })
      danglingMass = dm
      linf = lf
      val wallMs = (System.nanoTime() - t0) / 1000000L
      it += 1
      metrics += SuperstepMetrics(it, wallMs, blocks.n, l1, linf, 0L)
      state.unpersist(false)
      state = newState
    }
    graphR.unpersist(false)
    (spark.createDataset(state.values), it, metrics.toSeq)
  }

  /** Unpack block state back to (id, rank) rows for verification/readback. */
  def toRows(spark: SparkSession, state: Dataset[RankBlock],
             verts: Dataset[VertsBlock]): DataFrame = {
    import spark.implicits._
    state.joinWith(verts, state("pid") === verts("pid"))
      .flatMap { case (r, v) =>
        v.ids.indices.iterator.map(i => (v.ids(i), r.ranks(i)))
      }.toDF("id", "rank")
  }

  /** Convenience: full pipeline on (edges, vertices) DataFrames (packed
    * loop; the Dataset loop stays as the cross-implementation check). */
  def pagerank(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
               damping: Double = 0.85, tol: Double = 1e-6, maxIter: Int = 100)
      : (DataFrame, Int, Seq[SuperstepMetrics]) = {
    val blocks = build(spark, edges, vertices)
    val (state, iters, m) = runPacked(spark, blocks, damping, tol, maxIter)
    (toRows(spark, state, blocks.vertsOrFail), iters, m)
  }

  /** Size-routed PageRank — the measured CROSSOVER between the two physical
    * designs (sf0.1 probe, 32 threads, BENCH_r03): on a ~0.6M-edge graph the
    * CSR path spends ~5.5s building blocks to save ~0.1s/superstep, while on
    * the 171M-edge bench artifact the packed superstep sustains ~39M edges/s
    * at 8 pinned cores — far beyond the row-join plan. So: small graphs (or
    * few iterations) take the Dataset-join plan, big graphs amortize the
    * block build. The threshold is deliberately coarse; both paths are
    * oracle-gated to identical results (q_pagerank / q_pagerank_csr share
    * one DuckDB oracle). */
  def auto(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
           damping: Double = 0.85, tol: Double = 1e-6, maxIter: Int = 100,
           csrThreshold: Long = 20000000L)
      : (DataFrame, Int, Seq[SuperstepMetrics]) = {
    val nE = edges.count()
    if (nE >= csrThreshold) pagerank(spark, edges, vertices, damping, tol, maxIter)
    else {
      val r = new PageRank(damping = damping, tol = tol, maxIter = maxIter)
        .run(spark, edges, vertices)
      (r.state.select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("rank")), r.iterations, r.metrics)
    }
  }
}
