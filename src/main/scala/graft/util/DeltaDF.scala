package graft.util

import org.apache.spark.sql.{DataFrame, Encoder, Row, SparkSession}

/** |Δ|-bounded driver-side row sets as DataFrames, with the leaf node
  * chosen by size.
  *
  * Catalyst hashes and compares `LocalRelation` nodes BY VALUE — every
  * `hashCode`/`equals` walks all embedded rows — and the continuous tier's
  * per-batch plans run hundreds of tree transforms (eager Dataset analysis,
  * optimizer runs at every persist via `CacheManager.cacheQuery`'s eager
  * physical planning, cached-plan lookups), so a 100k-row local delta costs
  * O(rows) over and over on the single-threaded driver. Measured on the
  * one-window sf0.1 stream (120k-row delta): 0.16s per Dataset
  * construction, 0.25s per optimize, 0.26s per persist with a
  * LocalRelation leaf vs 0.03/0.04/0.05s with an RDD-backed leaf (identity
  * hash, O(1)).
  *
  * Below the threshold `LocalRelation` wins and is kept: it broadcasts and
  * collects driver-side with zero Spark jobs, which is what the per-op
  * micro-batch protocol (and the action-count discipline the specs pin)
  * wants for small batches. Above it, the rows are parallelized into a
  * ONE-partition RDD: broadcast builds and collects on it become tiny
  * sub-jobs inside the caller's action — same SQL-execution count, and the
  * driver-side plan work stops scaling with |Δ|. */
object DeltaDF {

  /** Crossover: below this a LocalRelation's O(rows) node hash is cheaper
    * than the RDD leaf's per-scan task overhead. */
  val threshold = 8192

  def of[T <: Product](spark: SparkSession, rows: Seq[T], names: String*)(
      implicit enc: Encoder[T]): DataFrame = {
    val df =
      if (rows.lengthCompare(threshold) <= 0) spark.createDataset(rows)(enc).toDF()
      else spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row.fromTuple), 1), enc.schema)
    if (names.isEmpty) df else df.toDF(names: _*)
  }
}
