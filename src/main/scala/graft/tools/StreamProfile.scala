package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.SparkListener

/** Dev profiler for the continuous tier: replays the SAME deterministic
  * stream Bench.streamingBench uses and prints, per micro-batch, the
  * wall-clock and every SQL execution (driver action) with its duration —
  * the map from per-batch cost to the exact action that pays it. Not part
  * of any driver contract; builder-side tool only. */
object StreamProfile {

  final case class Exec(id: Long, start: Long, var end: Long = -1L,
                        var desc: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "3").toInt
    val ops = sys.env.getOrElse("SPARK_GRAFT_OPS", "40000").toInt
    val spark = SparkSession.builder()
      .appName("graft-stream-profile").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("SPARK_GRAFT_NO_AQE").contains("1"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    import spark.implicits._
    import graft.matching.{MultiQueryDriver, QueryGraph}

    val execs = new java.util.concurrent.ConcurrentHashMap[Long, Exec]()
    val listener = new SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            val e = Exec(s.executionId, s.time)
            e.desc = s.physicalPlanDescription.linesIterator
              .filter(_.nonEmpty).take(12).mkString(" | ").take(600)
            execs.put(s.executionId, e); ()
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            Option(execs.get(s.executionId)).foreach(_.end = s.time); ()
          case _ => ()
        }
    }

    val e = graft.queries.GraftQueries.copurchaseEdges(spark, sfDir)
      .withColumn("elabel", ((col("src") + col("dst")) % 3).cast("int"))
      .localCheckpoint(true)
    val v = graft.queries.GraftQueries.table(spark, sfDir, "part")
      .select(col("p_partkey").as("id"), (col("p_partkey") % 4).cast("int").as("vlabel"))
      .localCheckpoint(true)
    System.err.println(s"[profile] graph |E|=${e.count()} |V|=${v.count()}")
    val qs = Map(
      "p012" -> QueryGraph.path(Seq(Some(0), Some(1), Some(2)), Seq(Some(1), Some(2))),
      "p123" -> QueryGraph.path(Seq(Some(1), Some(2), Some(3)), Seq(Some(0), Some(1))))
    val t00 = System.nanoTime()
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT", "8").toInt
    val driver = new MultiQueryDriver(spark, qs, v, e, materializeState = true,
      stateCompactEvery = compactEvery)
    System.err.println(f"[profile] driver init ${(System.nanoTime() - t00) / 1e9}%.1fs")

    val ids = v.orderBy(col("id")).limit(4000).select(col("id")).as[Long].collect()
    val rnd = new scala.util.Random(7)
    val live = scala.collection.mutable.Set.empty[(Long, Long)]
    val lines = new scala.collection.mutable.ArrayBuffer[String]
    (1 to batches).foreach { _ =>
      (1 to ops).foreach { _ =>
        if (live.nonEmpty && rnd.nextInt(10) < 3) {
          val p = live.head; live -= p
          lines += s"-e ${p._1} ${p._2} ${(p._1 + p._2) % 3}"
        } else {
          val a = ids(rnd.nextInt(ids.length)); val b = ids(rnd.nextInt(ids.length))
          if (a != b) {
            val (lo, hi) = (math.min(a, b), math.max(a, b))
            if (live.add((lo, hi))) lines += s"e $lo $hi ${(lo + hi) % 3}"
          }
        }
      }
    }
    val tmp = java.nio.file.Files.createTempFile("graft-stream-prof", ".txt")
    java.nio.file.Files.writeString(tmp, lines.mkString("\n"))
    val ups = graft.graph.TextGraph.loadUpdates(spark, tmp.toString)
      .collect().sortBy(_.seq)
    // ceil so the op count yields EXACTLY `batches` slices — floor left a
    // remainder micro-batch paying a whole batch's fixed cost for ~3 ops
    val slices = ups.grouped(math.max(1, (ups.length + batches - 1) / batches)).toSeq

    spark.sparkContext.addSparkListener(listener)
    slices.zipWithIndex.foreach { case (b, i) =>
      execs.clear()
      val t0 = System.nanoTime()
      driver.applyBatch(spark.createDataset(b.toSeq))
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkShims.waitListenerBusEmpty(spark.sparkContext)
      val done = execs.values().toArray(Array.empty[Exec]).filter(_.end > 0)
        .sortBy(e => -(e.end - e.start))
      val total = done.map(e => e.end - e.start).sum / 1e3
      System.err.println(f"[profile] batch $i: ${b.size} ops, wall $wall%.2fs, " +
        f"${done.length} actions, sum action time $total%.2fs, counts=${driver.counts.toMap}")
      val stor = spark.sparkContext.getRDDStorageInfo
      System.err.println(f"[profile]   storage: ${stor.length} rdds, " +
        f"${stor.map(_.memSize).sum / 1e6}%.0f MB mem, " +
        f"${stor.map(_.diskSize).sum / 1e6}%.0f MB disk, cachedParts " +
        f"${stor.map(_.numCachedPartitions).sum}/${stor.map(_.numPartitions).sum}")
      done.take(12).foreach { e =>
        System.err.println(f"  ${(e.end - e.start) / 1e3}%7.2fs  ${e.desc.take(220)}")
      }
    }
    spark.stop()
  }
}
