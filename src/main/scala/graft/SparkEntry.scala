package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.PageRank
import graft.graph.GraphBuilder
import graft.pages.PagesFixture

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full north-rule pipeline end-to-end on a deterministic
    * `input_hint`-shaped pages table — synthesize pages → extract links →
    * xxhash64 ids (collision-audited) → PageRank to 1e-6 → (url, rank).
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pages = spark.createDataset(PagesFixture.generate(nSites = 8, pagesPerSite = 25))
    val (vertices, edges) = GraphBuilder.buildVerified(spark, pages)
    val result = new PageRank(tol = 1e-6, maxIter = 100)
      .run(spark, edges.toDF(), vertices.toDF())
    result.state.join(vertices, Seq("id"))
      .select(col("url"), round(col("rank"), 8).as("pr"))
      .orderBy(col("pr").desc, col("url"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (catalogue lives
    * in graft.queries.GraftQueries). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraftQueries.queries

  /** DuckDB-equivalent SQL for every SQL-expressible query (same column
    * names & ordering; floats rounded identically on both sides). */
  def oracleSql: Map[String, String] = graft.queries.GraftQueries.oracleSql
}
