package graft.stream

import org.apache.spark.sql.{functions, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.graph.GraphUpdate

/** Structured-Streaming ingestion of the update stream — the realized form
  * of the reference's aspirational Flink-style dataflow sketch
  * (ParaCOSM/Stream/main.cpp:16-30: addDataGraphSource /
  * addUpdateGraphSource / execute) and of its shipped micro-batch window
  * protocol (BatchUpdates3, main.cpp:253-397): each micro-batch is
  * classified (safe/unsafe), safe updates fold into state without
  * recompute, unsafe ones trigger the incremental algorithm.
  *
  * Two continuously-maintained results:
  *  - connected components (warm-start on adds, cold on deletes);
  *  - the TRIANGLE COUNT via delta joins (J3/J4): per batch,
  *    count += touching(E_new, added) − touching(E_old, deleted) — the
  *    reference's positive/negative result counters
  *    (graphflow.cpp:289-416), never a from-scratch recount. This is
  *    continuous subgraph matching for Q = C₃ on the stream.
  *
  * State lives in driver-held DataFrames that are localCheckpoint'd per
  * batch (single-process tier); on a cluster the same code commits per-batch
  * snapshots through StateStore instead — same call shape.
  */
final class StreamGraph(spark: SparkSession,
                        initialVertices: DataFrame,
                        initialEdges: DataFrame,
                        maintainTriangles: Boolean = false) {

  @volatile var vertices: DataFrame = initialVertices.localCheckpoint(true)
  @volatile var edges: DataFrame = initialEdges.localCheckpoint(true)
  @volatile var ccState: DataFrame =
    new graft.algo.ConnectedComponents(maxIter = 60)
      .run(spark, edges, vertices).state.localCheckpoint(true)
  @volatile var totalSafe: Long = 0L
  @volatile var totalUnsafe: Long = 0L
  @volatile var batchesSeen: Long = 0L
  @volatile var triangleCount: Long =
    if (maintainTriangles)
      graft.algo.TriangleCount.countTriangles(spark, edges).head().getLong(0)
    else -1L
  @volatile var trianglePositive: Long = 0L // G2 counters
  @volatile var triangleNegative: Long = 0L

  private def canon(df: DataFrame): DataFrame = df.select(
    functions.least(functions.col("src"), functions.col("dst")).as("src"),
    functions.greatest(functions.col("src"), functions.col("dst")).as("dst"))
    .where(functions.col("src") =!= functions.col("dst")).distinct()

  /** Attach to a streaming Dataset[GraphUpdate]; every micro-batch runs the
    * classify → apply → (maybe) recompute protocol. */
  def start(updates: Dataset[GraphUpdate], trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    updates.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[GraphUpdate], _: Long) =>
        if (!batch.isEmpty) {
          val e0 = edges
          val (v1, e1, res, nSafe, nUnsafe) =
            Updates.incrementalCC(spark, vertices, edges, ccState, batch)
          vertices = v1
          edges = e1
          ccState = res.state.localCheckpoint(true)
          totalSafe += nSafe
          totalUnsafe += nUnsafe
          batchesSeen += 1
          if (maintainTriangles) {
            val before = canon(e0).localCheckpoint(true)
            val after = canon(e1).localCheckpoint(true)
            val added = after.join(before, Seq("src", "dst"), "left_anti")
              .localCheckpoint(true)
            val deleted = before.join(after, Seq("src", "dst"), "left_anti")
              .localCheckpoint(true)
            val pos =
              if (added.limit(1).count() == 0) 0L
              else graft.matching.DeltaTriangles
                .trianglesTouching(spark, after, added).head().getLong(0)
            val neg =
              if (deleted.limit(1).count() == 0) 0L
              else graft.matching.DeltaTriangles
                .trianglesTouching(spark, before, deleted).head().getLong(0)
            trianglePositive += pos
            triangleNegative += neg
            triangleCount += pos - neg
          }
        }
        ()
      }
      .start()
  }
}
