package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the reference's text graph/update-stream format (S1/S2 —
  * ParaCOSM/CSM/graph/graph.cpp:217-285, grammar in README.md:42-83):
  *
  *   t # <n>            header, skipped
  *   v <id> <label>     vertex with label
  *   e <src> <dst> [<elabel>]   edge (label optional in some converted
  *                              fixtures; defaults to 0)
  *   -v <id> <label>    vertex delete   (update streams only)
  *   -e <src> <dst> [<elabel>]  edge delete
  *
  * This is the only way to replay the reference's own fixtures (data/,
  * benchmark/) against this engine — its strongest oracle is identical
  * counts across its six algorithms on these files.
  *
  * Update-stream ORDER: the file order IS the stream order (the reference
  * reads into a FIFO). `spark.read.text` keeps file order within partitions
  * and partitions are file-offset ordered, so a coalesce(1) +
  * monotonically_increasing_id yields the faithful `seq` (update files are
  * modest; the big table is the data graph, which is order-free).
  */
object TextGraph {

  private def tokens(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("p"))
      .where(size(col("p")) >= 2)

  /** Parse a `v`/`e` graph file into
    * (vertices(id, vlabel), edges(src, dst, elabel)).
    * `get()` (not positional apply) tolerates the optional trailing elabel
    * under ANSI mode. */
  def loadGraph(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val t = tokens(spark, path)
    val vertices = t.where(col("p")(0) === "v")
      .select(get(col("p"), lit(1)).cast("long").as("id"),
        get(col("p"), lit(2)).cast("int").as("vlabel"))
    val edges = t.where(col("p")(0) === "e")
      .select(get(col("p"), lit(1)).cast("long").as("src"),
        get(col("p"), lit(2)).cast("long").as("dst"),
        coalesce(get(col("p"), lit(3)).cast("int"), lit(0)).as("elabel"))
    (vertices, edges)
  }

  /** Parse a `v/-v/e/-e` update stream into an ORDERED Dataset[GraphUpdate]
    * (seq = position in the file). */
  def loadUpdates(spark: SparkSession, path: String): Dataset[GraphUpdate] = {
    import spark.implicits._
    tokens(spark, path)
      .where(col("p")(0).isin("v", "-v", "e", "-e"))
      .coalesce(1)
      .withColumn("seq", monotonically_increasing_id())
      .select(col("seq"), col("p")(0).as("op"),
        get(col("p"), lit(1)).cast("long").as("id1"),
        when(col("p")(0).isin("e", "-e"), get(col("p"), lit(2)).cast("long"))
          .otherwise(lit(0L)).as("id2"),
        when(col("p")(0).isin("e", "-e"),
          coalesce(get(col("p"), lit(3)).cast("int"), lit(0)))
          .otherwise(coalesce(get(col("p"), lit(2)).cast("int"), lit(0))).as("label"))
      .as[GraphUpdate]
  }

  /** Tiny driver-side query-graph parse (query graphs are 3-25 vertices —
    * the reference also holds them in memory). */
  def loadQueryGraph(path: String): graft.matching.QueryGraph = {
    val lines = scala.io.Source.fromFile(path)
    try {
      val toks = lines.getLines().map(_.trim).filter(_.nonEmpty)
        .map(_.split("\\s+")).toVector
      val vs = toks.filter(_(0) == "v").map(p =>
        graft.matching.QVertex(s"u${p(1)}", Some(p(2).toInt)))
      val es = toks.filter(_(0) == "e").map(p =>
        graft.matching.QEdge(s"u${p(1)}", s"u${p(2)}",
          if (p.length > 3) Some(p(3).toInt) else None))
      graft.matching.QueryGraph(vs, es)
    } finally lines.close()
  }
}
