package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.graph.GraphUpdate
import graft.matching.{MultiQueryDriver, QueryGraph}

/** CONTINUOUS subgraph matching over Structured Streaming — ParaCOSM's
  * actual product surface (maintain N query graphs' match counts under a
  * live update stream, README.md:6-11) in Spark's native streaming shape:
  * `readStream` → `foreachBatch` → the MultiQueryDriver's
  * classify-route-delta-join protocol per micro-batch. The driver state
  * (labeled graph, per-query counts, optional candidate indexes) lives
  * across batches exactly like the reference's in-memory graph + DCS.
  *
  * This is the streaming twin of replayed-batch MultiQueryDriver use; both
  * are validated by counts == from-scratch recompute (MultiQuerySpec /
  * StreamMatcherSpec). StreamGraph remains the label-free tier (CC +
  * triangle maintenance); this one is the labeled CSM tier.
  */
final class StreamMatcher(spark: SparkSession,
                          queries: Map[String, QueryGraph],
                          initialVertices: DataFrame, // (id, vlabel)
                          initialEdges: DataFrame,    // (src, dst, elabel)
                          useCandidateIndex: Boolean = false,
                          materializeState: Boolean = false) {

  // mode exclusivity mirrors MultiQueryDriver's own require: the index tier
  // (J7/X2) and the materialized SJ-tree tier (J6) are alternative state
  // models for the same maintained counts, never composed
  require(!(useCandidateIndex && materializeState),
    "useCandidateIndex and materializeState are mutually exclusive modes")

  val driver = new MultiQueryDriver(spark, queries, initialVertices,
    initialEdges, useCandidateIndex, materializeState = materializeState)

  def counts: Map[String, Long] = driver.counts.toMap

  def start(updates: Dataset[GraphUpdate],
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    updates.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[GraphUpdate], _: Long) =>
        if (!batch.isEmpty) { driver.applyBatch(batch); () }
      }
      .start()
}
