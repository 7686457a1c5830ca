package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * State lives in driver-held DataFrames that are localCheckpoint'd per
  * batch (single-process tier); on a cluster the same code commits per-batch
  * snapshots through StateStore instead — same call shape.
  */
final class StreamGraph(spark: SparkSession,
                        initialVertices: DataFrame,
                        initialEdges: DataFrame) {

  @volatile var vertices: DataFrame = initialVertices.localCheckpoint(true)
  @volatile var edges: DataFrame = initialEdges.localCheckpoint(true)
  @volatile var ccState: DataFrame =
    new graft.algo.ConnectedComponents(maxIter = 60)
      .run(spark, edges, vertices).state.localCheckpoint(true)
  @volatile var totalSafe: Long = 0L
  @volatile var totalUnsafe: Long = 0L
  @volatile var batchesSeen: Long = 0L

  /** Attach to a streaming Dataset[GraphUpdate]; every micro-batch runs the
    * classify → apply → (maybe) recompute protocol. */
  def start(updates: Dataset[GraphUpdate], trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    updates.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[GraphUpdate], _: Long) =>
        if (!batch.isEmpty) {
          val (v1, e1, res, nSafe, nUnsafe) =
            Updates.incrementalCC(spark, vertices, edges, ccState, batch)
          vertices = v1
          edges = e1
          ccState = res.state.localCheckpoint(true)
          totalSafe += nSafe
          totalUnsafe += nUnsafe
          batchesSeen += 1
        }
        ()
      }
      .start()
  }
}
