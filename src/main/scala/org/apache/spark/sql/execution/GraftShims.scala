package org.apache.spark.sql.execution

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.classic.{Dataset => CDataset}

/** Minimal private[sql] access shim for graft's iterative kernels.
  *
  * Problem being solved (documented in CsrPageRank.run): an iterative
  * superstep whose message stream AND merge input both derive from the
  * current state multiplies the state's Catalyst size estimate by itself
  * every iteration — `Dataset.localCheckpoint` cuts lineage but copies the
  * ORIGIN statistics into the resulting LogicalRDD, so the BigInteger
  * sizeInBytes squares per superstep and the driver drowns in
  * BigInteger.multiply by ~iteration 20. The stock escape hatch,
  * `spark.createDataset(ds.rdd)`, resets the stats but ALSO discards the
  * physical outputPartitioning, forcing a full state exchange every
  * superstep (the dominant fixed cost at bench scale).
  *
  * This shim does both at once: same materialized rows, same physical
  * partitioning (so co-partitioned joins on the state key need no
  * exchange), origin statistics dropped (leaf reverts to
  * spark.sql.defaultSizeInBytes — bounded, iteration-independent).
  * Everything used here is stable `private[sql]` surface that
  * `Dataset.checkpoint` itself is built from.
  */
object GraftShims {

  def freshStatsPreservePartitioning[T: Encoder](ds: Dataset[T]): Dataset[T] = {
    val cds = ds.asInstanceOf[CDataset[T]]
    val spark = cds.sparkSession
    // fromDataset performs the physical->logical attribute rewrite for the
    // partitioning/ordering exactly like Dataset.checkpoint does
    val lr = LogicalRDD.fromDataset(cds.queryExecution.toRdd, cds, cds.isStreaming)
    val cleared = lr.copy()(spark, None, None) // drop originStats + constraints
    CDataset.ofRows(spark, cleared).as[T]
  }
}
