package graft

import org.apache.spark.sql.SparkSession

/** Standalone scaling-evidence runner (the bench's scaling section alone) —
  * used while tuning the superstep kernel and artifact size without paying
  * for the full query sweep. Same protocol as graft.Bench: one prebuilt
  * CSR-block artifact, interleaved best-of across parallelism levels. */
object BenchScalingOnly {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sites = sys.env.getOrElse("SCALE_SITES", "80000").toInt
    val pps = sys.env.getOrElse("SCALE_PPS", "1000").toInt
    val schedule = sys.env.getOrElse("SCALE_SCHEDULE", "2,8,32,2,8,2,8")
      .split(",").map(_.trim.toInt).toSeq
    val blockP = 64
    val (iters, warm) = (5, 1)

    // SCALE_ARTIFACT reuses a previously-saved artifact (skip the build)
    val blockPath = sys.env.get("SCALE_ARTIFACT") match {
      case Some(p) => p
      case None =>
        val bp = java.nio.file.Files.createTempDirectory("graft-scaling").toString
        val bs = session(32)
        bs.conf.set("spark.sql.shuffle.partitions", blockP.toString)
        val t0 = System.nanoTime()
        val eDF = graft.pages.PagesFixture.edgesDistributed(bs, sites, pps, 64)
          .toDF("src", "dst")
        val built = graft.algo.CsrPageRank.buildDense(bs, eDF, nVerts = sites.toLong * pps)
        val nE = eDF.count()
        graft.algo.CsrPageRank.save(built, bp)
        bs.stop()
        System.err.println(f"[scaling] built $nE edges in ${(System.nanoTime() - t0) / 1e9}%.0fs at $bp")
        bp
    }
    val nEdges: Long = sys.env.get("SCALE_EDGES").map(_.toLong).getOrElse {
      val s = session(8)
      import org.apache.spark.sql.functions.{col, size, sum}
      val e = graft.algo.CsrPageRank.load(s, blockPath).graph.toDF()
        .agg(sum(size(col("edgeSrcIdx")))).head().getLong(0)
      s.stop(); e
    }

    val best = scala.collection.mutable.Map.empty[Int, Double]
    schedule.foreach { c =>
      val ms = Bench.bestSuperstepMs(c, blockP, blockPath, iters, warm)
      best(c) = math.min(best.getOrElse(c, Double.MaxValue), ms)
      System.err.println(f"[scaling] cores=$c%-3d best=${ms}%.0fms cumBest=${best(c)}%.0fms " +
        f"thr=${nEdges / best(c) * 1000}%.0f e/s (taskset-pinned child JVM)")
    }
    val thr = best.map { case (c, ms) => c -> nEdges.toDouble / (ms / 1000.0) }
    val eff28 = thr.get(8).flatMap(t8 => thr.get(2).map(t2 => t8 / (4 * t2))).getOrElse(0.0)
    val eff832 = thr.get(32).flatMap(t32 => thr.get(8).map(t8 => t32 / (4 * t8))).getOrElse(0.0)
    println(f"""{"edges":$nEdges,"eff_2_8":$eff28%.3f,"eff_8_32":$eff832%.3f,"thr":${thr.toSeq.sortBy(_._1).map { case (c, t) => f""""$c":$t%.0f""" }.mkString("{", ",", "}")}}""")
  }
}
