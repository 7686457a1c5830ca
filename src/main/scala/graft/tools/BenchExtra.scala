package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round measurement harness (guide §1): times each declared
  * query in isolation with the NOOP sink (§1.4 — computes every column,
  * no sink cost, full plan visible in the SQL tab), labels jobs (§1.5),
  * and dumps `.explain("formatted")` per query so plan claims are
  * auditable. The canonical artifact stays `graft.Bench` (frozen); this
  * main exists so iteration numbers and plan receipts can be produced
  * without touching the frozen harness.
  *
  * Usage: runMain graft.tools.BenchExtra <planOutDir|-> [suffix] [q1,q2,...]
  *   planOutDir  where <query>_<suffix>.txt explain dumps go ("-" = skip)
  *   suffix      e.g. "before" / "after"
  *   queries     comma list; default = every non-excluded bench query
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SAMPLES (default 2)
  */
object BenchExtra {

  private val excluded =
    Set("q_dedup_jaccard", "q_embed_sim_pairs", "q_csm_maintained", "q_stream_maintained")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val samples = sys.env.getOrElse("SPARK_GRAFT_SAMPLES", "2").toInt
    val planDir = args.headOption.getOrElse("-")
    val suffix = if (args.length > 1) args(1) else "before"
    val only = if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dropCaches(): Unit = {
      try {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      } catch { case _: Throwable => () }
    }

    if (planDir != "-") new java.io.File(planDir).mkdirs()

    val toRun = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => excluded(n) }
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val results = toRun.map { case (name, fn) =>
      // plan dump first (cheap; the query body may itself run jobs)
      if (planDir != "-") {
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$planDir/${name}_$suffix.txt"), txt)
        } catch { case e: Throwable =>
          System.err.println(s"[extra] $name explain failed: ${e.getMessage}")
        }
        dropCaches()
      }
      val times = (1 to samples).map { _ =>
        spark.sparkContext.setJobDescription(s"extra:$name")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[extra] $name failed: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        dropCaches()
        secs
      }
      System.err.println(f"[extra] $name%-24s best=${times.min}%7.2fs  samples=" +
        times.map(t => f"$t%.2f").mkString(","))
      name -> times.min
    }
    val js = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"extra_noop_best":$js,"sf":"$sfDir","samples":$samples}""")
    spark.stop()
    Runtime.getRuntime.halt(0)
  }
}
