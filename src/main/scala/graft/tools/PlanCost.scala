package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-measurement: where does a per-batch delta persist spend its time —
  * analysis, optimization, physical planning, or cache lookup? */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("plan-cost").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", sys.env.getOrElse("EXCL", ""))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // base relation ~2.4M rows, checkpointed (like rel)
    val rel = (0L until 1200000L).map(i => (i, (i * 7) % 1200000L, (i % 3).toInt, (i % 4).toInt, ((i * 7) % 4).toInt))
      .toDF("src", "dst", "elabel", "slabel", "dlabel").localCheckpoint(true)
    // delta ~240k-row local relation
    val addRows = (0L until sys.env.getOrElse("NADD","120000").toLong).map(i => (i, i + 1, (i % 3).toInt, (i % 4).toInt, ((i + 1) % 4).toInt))
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs"); r
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val addedRel =
        if (sys.env.get("RDDLOCAL").contains("1"))
          t("toDF rdd-backed")(spark.createDataFrame(
            spark.sparkContext.parallelize(addRows.map(r => org.apache.spark.sql.Row(r._1 + round, r._2, r._3, r._4, r._5)), 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("dst", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("elabel", org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("slabel", org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("dlabel", org.apache.spark.sql.types.IntegerType)))))
        else t("toDF local")((addRows.map(r => (r._1 + round, r._2, r._3, r._4, r._5))).toDF("src", "dst", "elabel", "slabel", "dlabel"))
      val relNew = t("union")(rel.union(addedRel))
      val seedD = t("seed filter+select")(addedRel.where(col("elabel") === 1 && col("slabel") === 2).select(col("src").as("A"), col("dst").as("B")))
      val j = t("join build")(seedD.join(broadcast(relNew.as("j1").where(col("elabel") === 2)), seedD("B") === col("j1.src")).where(col("j1.dst") =!= seedD("A")).select(seedD("A"), seedD("B"), col("j1.dst").as("C")))
      t("analyzed force")(j.queryExecution.analyzed)
      t("optimized force")(j.queryExecution.optimizedPlan)
      t("executedPlan force")(j.queryExecution.executedPlan)
      val p = t("persist")(j.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      t("unpersist")(p.unpersist(false))
    }
    spark.stop()
  }
}
