package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, SparkSession => CSparkSession}
import org.apache.spark.storage.StorageLevel

/** private[sql] access for graft's continuous tier: materialize a plan as a
  * persisted InternalRow RDD and re-wrap it as a leaf Dataset.
  *
  * Why: the maintained state tables (graph, symmetric relation, SJ-tree
  * stages) are updated per micro-batch by tiny overlays. Left as Catalyst
  * views, every batch adds a full-stream pass per scan (and the analyzed
  * tree re-expands per reference); `localCheckpoint` truncates but posts a
  * tracked Dataset action per call — per-state-table per-batch actions
  * would scale with the number of registered queries. `queryExecution.toRdd`
  * + `internalCreateDataFrame` performs the same truncation with ZERO
  * tracked actions and no Row<->InternalRow double conversion; the copy()
  * is mandatory (operators reuse UnsafeRow instances within a partition —
  * caching uncopied rows aliases them). */
object GraftSqlShims {

  /** Plan → lazily persisted InternalRow RDD + leaf DataFrame over it.
    * Materializes on first downstream scan (inside the caller's next
    * action); the caller owns unpersist of the returned RDD. */
  def truncated(df: DataFrame,
                level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, RDD[InternalRow]) = {
    val cdf = df.asInstanceOf[CDataFrame]
    val spark = cdf.sparkSession.asInstanceOf[CSparkSession]
    // coalesce (narrow) to the session's shuffle parallelism: the overlay
    // plans UNION the previous leaf with per-batch deltas, so without it
    // every roll ADDS partitions and per-scan task count grows without
    // bound (measured: 546 → 3 681 cached partitions over 6 batches)
    val parts = spark.sessionState.conf.numShufflePartitions
    val rdd = cdf.queryExecution.toRdd.map(_.copy())
      .coalesce(parts).persist(level)
    (spark.internalCreateDataFrame(rdd, cdf.schema), rdd)
  }
}
