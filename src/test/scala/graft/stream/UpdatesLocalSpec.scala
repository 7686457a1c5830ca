package graft.stream

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.GraphUpdate

/** Equivalence of the driver-local micro-batch fast path with the
  * DataFrame path it mirrors (compaction, labeled application with -v
  * segmentation, canonical edge delta with cascade + dup-add cases) —
  * randomized over many op mixes so the mirrors can't drift. */
class UpdatesLocalSpec extends SparkSpec {

  private def randomBatch(seed: Int, n: Int, ids: Int): Seq[GraphUpdate] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val a = rnd.nextInt(ids).toLong
      val b = (rnd.nextInt(ids - 1) + 1 + a) % ids
      rnd.nextInt(10) match {
        case 0 => GraphUpdate(i.toLong, "v", a, 0L, rnd.nextInt(3))
        case 1 => GraphUpdate(i.toLong, "-v", a, 0L, 0)
        case 2 | 3 => GraphUpdate(i.toLong, "-e", a, b, 0)
        case _ => GraphUpdate(i.toLong, "e", a, b, rnd.nextInt(3))
      }
    }
  }

  private def baseGraph(seed: Int, ids: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed + 1000)
    val verts = (0 until ids).map(i => (i.toLong, rnd.nextInt(3))).toDF("id", "vlabel")
    val edges = (1 to ids * 2).map { _ =>
      val a = rnd.nextInt(ids).toLong
      val b = rnd.nextInt(ids).toLong
      (a, b, rnd.nextInt(3))
    }.filter(t => t._1 != t._2).distinct
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique directed keys
      .toDF("src", "dst", "elabel")
    (verts.localCheckpoint(true), edges.localCheckpoint(true))
  }

  test("compactLocal equals compact (random batches)") {
    import spark.implicits._
    (0 until 5).foreach { s =>
      val ops = randomBatch(s, 60, 12)
      val viaDf = Updates.compact(spark.createDataset(ops))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val local = Updates.compactLocal(ops)
        .map(u => (u.seq, u.op, u.id1, u.id2)).toSet
      assert(local == viaDf, s"seed $s")
    }
  }

  test("applyBatchLabeledLocal equals applyBatchLabeled (random, with -v segments)") {
    import spark.implicits._
    (0 until 6).foreach { s =>
      val (v0, e0) = baseGraph(s, 10)
      val ops = randomBatch(s, 40, 10)
      val (vA, eA) = Updates.applyBatchLabeled(spark, v0, e0, spark.createDataset(ops))
      val (vB, eB) = Updates.applyBatchLabeledLocal(spark, v0, e0, ops)
      val va = vA.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val vb = vB.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val ea = eA.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val eb = eB.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(vb == va, s"vertices diverge at seed $s")
      assert(eb == ea, s"edges diverge at seed $s")
    }
  }

  test("local apply is broadcast-only: no shuffle ever touches the graph tables") {
    import spark.implicits._
    // adversarial: kill auto-broadcast so ONLY explicitly-hinted broadcasts
    // survive — at warehouse scale the graph tables are far over any
    // auto-broadcast threshold, so the plan shape must not depend on it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try testBroadcastOnly()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def testBroadcastOnly(): Unit = {
    import spark.implicits._
    val v0 = (0L until 2000L).map(i => (i, (i % 3).toInt)).toDF("id", "vlabel")
      .localCheckpoint(true)
    val e0 = (0L until 1999L).map(i => (i, i + 1, (i % 2).toInt))
      .toDF("src", "dst", "elabel").localCheckpoint(true)
    val ops = Seq(
      GraphUpdate(1, "e", 5L, 500L, 1),
      GraphUpdate(2, "e", 7L, 8L, 0),      // duplicate of an existing edge
      GraphUpdate(3, "-e", 100L, 101L, 0),
      GraphUpdate(4, "v", 3000L, 0L, 2),
      GraphUpdate(5, "-v", 1500L, 0L, 0))
    val (vL, eL) = Updates.applyBatchLabeledLocal(spark, v0, e0, ops)
    val (vU, eU) = Updates.applyBatchUnlabeledLocal(spark,
      v0.select(col("id")), e0.select(col("src"), col("dst")), ops)
    // the generic DataFrame paths must hold the same shape (they previously
    // whole-table-shuffled via dropDuplicates / a big-right LeftAnti)
    val batch = spark.createDataset(ops)(org.apache.spark.sql.Encoders.product[GraphUpdate])
    val (vD, eD) = Updates.applyBatch(spark,
      v0.select(col("id")), e0.select(col("src"), col("dst")), batch)
    val (vDL, eDL) = Updates.applyBatchLabeled(spark, v0, e0, batch)
    Seq(vL, eL, vU, eU, vD, eD, vDL, eDL).foreach { df =>
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), s"full-table sort-merge join in:\n$plan")
      assert(!plan.contains("ShuffledHashJoin"), s"full-table shuffled join in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"shuffle exchange in:\n$plan")
    }
  }

  test("applyBatchUnlabeledLocal equals applyBatch (random, with -v segments)") {
    import spark.implicits._
    (0 until 6).foreach { s =>
      val (v0l, e0l) = baseGraph(s + 100, 10)
      val v0 = v0l.select(col("id")).localCheckpoint(true)
      val e0 = e0l.select(col("src"), col("dst")).localCheckpoint(true)
      val ops = randomBatch(s + 100, 40, 10)
      val (vA, eA) = Updates.applyBatch(spark, v0, e0, spark.createDataset(ops))
      val (vB, eB) = Updates.applyBatchUnlabeledLocal(spark, v0, e0, ops)
      assert(vB.collect().map(_.getLong(0)).toSet == vA.collect().map(_.getLong(0)).toSet,
        s"vertices diverge at seed $s")
      assert(eB.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        eA.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        s"edges diverge at seed $s")
    }
  }

  test("pureEdgeBatchLocal equals the general composition (random pure-edge batches)") {
    import spark.implicits._
    (0 until 8).foreach { s =>
      val (v0, e0) = baseGraph(s + 200, 10)
      // pure-edge mix with dup adds, dels of absent edges, and canon twins
      val rnd = new scala.util.Random(s + 200)
      val ops = (1 to 40).map { i =>
        val a = rnd.nextInt(10).toLong
        val b = (rnd.nextInt(9) + 1 + a) % 10
        if (rnd.nextInt(10) < 3) GraphUpdate(i.toLong, "-e", a, b, 0)
        else GraphUpdate(i.toLong, "e", a, b, rnd.nextInt(3))
      }
      val (_, e1g) = Updates.applyBatchLabeledLocal(spark, v0, e0, ops)
      val e1gc = e1g.localCheckpoint(true)
      val general = Updates.edgeDeltaCollected(spark, e0, e1gc, ops)

      val (e1f, fast) = Updates.pureEdgeBatchLocal(spark, e0, ops)
      assert(e1f.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
        e1gc.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet,
        s"after view diverges at seed $s")
      assert(fast.added.toSet == general.added.toSet, s"added keys diverge at seed $s")
      assert(fast.deleted.toSet == general.deleted.toSet, s"deleted keys diverge at seed $s")
      assert(fast.addedRows.toSet == general.addedRows.toSet, s"added rows diverge at seed $s")
      assert(fast.deletedRows.toSet == general.deletedRows.toSet,
        s"deleted rows diverge at seed $s")
    }
  }

  test("pureEdgeBatchLocal applies self-loop deletes (incl. self-loop-only batches)") {
    import spark.implicits._
    val v0 = (0L to 5L).map(i => (i, (i % 3).toInt)).toDF("id", "vlabel")
      .localCheckpoint(true)
    // base WITH pre-existing self-loop rows (the maintained algebra never
    // creates them, but an initialEdges table may carry them)
    val e0 = Seq((0L, 1L, 0), (1L, 2L, 1), (2L, 2L, 2), (3L, 3L, 0), (4L, 5L, 1))
      .toDF("src", "dst", "elabel").localCheckpoint(true)

    def parity(ops: Seq[GraphUpdate], tag: String): Unit = {
      val (_, e1g) = Updates.applyBatchLabeledLocal(spark, v0, e0, ops)
      val e1gc = e1g.localCheckpoint(true)
      val general = Updates.edgeDeltaCollected(spark, e0, e1gc, ops)
      val (e1f, fast) = Updates.pureEdgeBatchLocal(spark, e0, ops)
      assert(e1f.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
        e1gc.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet,
        s"$tag: after view diverges")
      assert(fast.added.toSet == general.added.toSet, s"$tag: added keys diverge")
      assert(fast.deleted.toSet == general.deleted.toSet, s"$tag: deleted keys diverge")
    }

    // ONLY self-loop ops — hits the empty-candidate early return: the '-e 2 2'
    // must still delete the pre-existing loop row, the 'e 4 4' is dropped
    parity(Seq(GraphUpdate(1, "-e", 2L, 2L, 0), GraphUpdate(2, "e", 4L, 4L, 2)),
      "self-loop-only")
    // mixed: normal ops plus a self-loop delete and a self-loop add
    parity(Seq(GraphUpdate(1, "e", 0L, 2L, 1), GraphUpdate(2, "-e", 3L, 3L, 0),
      GraphUpdate(3, "-e", 0L, 1L, 0), GraphUpdate(4, "e", 5L, 5L, 1)), "mixed")
    // add-then-delete and delete-then-add on the same self-loop key compact
    // to the last op, like the labeled path
    parity(Seq(GraphUpdate(1, "e", 2L, 2L, 1), GraphUpdate(2, "-e", 2L, 2L, 0)),
      "add-then-del")
    parity(Seq(GraphUpdate(1, "-e", 3L, 3L, 0), GraphUpdate(2, "e", 3L, 3L, 1)),
      "del-then-add")
  }

  test("edgeDeltaCollected equals edgeDelta keys and slices (random)") {
    import spark.implicits._
    (0 until 6).foreach { s =>
      val (v0, e0) = baseGraph(s + 50, 10)
      val ops = randomBatch(s + 50, 40, 10)
      val batch = spark.createDataset(ops)
      val (v1, e1) = Updates.applyBatchLabeled(spark, v0, e0, batch)
      val e1c = e1.localCheckpoint(true)

      val (addDf, delDf) = Updates.edgeDelta(spark, e0, e1c, batch)
      val addK = addDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val delK = delDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val local = Updates.edgeDeltaCollected(spark, e0, e1c, ops)
      assert(local.added.toSet == addK, s"added keys diverge at seed $s")
      assert(local.deleted.toSet == delK, s"deleted keys diverge at seed $s")

      // slices: rows of after/before whose canonical key is in the delta
      def slice(t: org.apache.spark.sql.DataFrame, keys: Set[(Long, Long)]) =
        t.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .filter(r => keys((math.min(r._1, r._2), math.max(r._1, r._2)))).toSet
      assert(local.addedRows.toSet == slice(e1c, addK), s"added rows diverge at seed $s")
      assert(local.deletedRows.toSet == slice(e0, delK), s"deleted rows diverge at seed $s")
      val _ = v1
    }
  }
}
