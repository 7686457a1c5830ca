package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side profiling aid: phase timings for the heavy bench queries
  * (not part of the driver contract; kept for future rounds' perf work). */
object Probe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val what = args.headOption.getOrElse("tri_delta")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    what match {
      case "tri_delta" =>
        val all = t("copurchase+checkpoint") {
          graft.queries.GraftQueries.copurchaseEdges(spark, sfDir).localCheckpoint(true)
        }
        val adds = all.where((col("src") + col("dst")) % 10 === 0)
        val base = t("base anti-join+checkpoint") {
          all.join(adds, Seq("src", "dst"), "left_anti").localCheckpoint(true)
        }
        val dels = all.where((col("src") + col("dst")) % 10 === 5)
        val bulk = t("bulkCounts(all)") {
          graft.matching.DeltaTriangles.bulkCounts(spark, base.union(adds), adds, dels)
        }
        println(s"[probe] bulk total/pos/neg=$bulk")
        val counts = t("nDelta+nBase counts") { (adds.count(), dels.count(), base.count()) }
        println(s"[probe] counts=$counts")

      case "match_idx" =>
        import graft.matching.{CandidateIndex, GraphMatcher, QueryGraph}
        val (e, v) = (graft.queries.GraftQueries.copurchaseEdges(spark, sfDir)
          .withColumn("elabel", ((col("src") + col("dst")) % 3).cast("int")),
          graft.queries.GraftQueries.table(spark, sfDir, "part")
            .select(col("p_partkey").as("id"), (col("p_partkey") % 4).cast("int").as("vlabel")))
        val q = QueryGraph.path(
          vlabels = Seq(Some(0), Some(1), Some(2)),
          elabels = Seq(Some(1), Some(2)))
        val rel = t("materializedRelation") {
          GraphMatcher.materializedRelation(e, v)
        }
        val idx = t("buildOnRel") {
          CandidateIndex.buildOnRel(spark, q, rel, v, rounds = 2)
        }
        t("index sizes job") { println(s"[probe] sizes=${idx.sizes}") }
        val stats = t("edgeStatistics") { GraphMatcher.edgeStatistics(q, rel) }
        println(s"[probe] stats=$stats")
        t("plan+count") {
          val n = GraphMatcher.findMatches(spark, q, e, v,
            candidates = Some(idx.candidates), preRel = Some(rel))
            .groupBy(col("u1")).agg(count(lit(1)).as("n")).count()
          println(s"[probe] groups=$n")
        }

      case "minhash" =>
        t("q_dedup_minhash") {
          graft.queries.GraftQueries.queries("q_dedup_minhash")(spark, sfDir).count()
        }
        t("q_dedup_minhash 2nd") {
          graft.queries.GraftQueries.queries("q_dedup_minhash")(spark, sfDir).count()
        }

      case "csr" =>
        val e = t("procurement edges") {
          graft.queries.GraftQueries.procurementEdges(spark, sfDir).localCheckpoint(true)
        }
        val verts = e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct()
        val blocks = t("build") { graft.algo.CsrPageRank.build(spark, e, verts) }
        val (state, iters, _) = t("run 10 iters") {
          graft.algo.CsrPageRank.run(spark, blocks, tol = 0.0, maxIter = 10)
        }
        t("toRows+collect") {
          println("[probe] rows=" + graft.algo.CsrPageRank
            .toRows(spark, state, blocks.vertsOrFail).count())
        }
    }
    spark.stop()
  }
}
