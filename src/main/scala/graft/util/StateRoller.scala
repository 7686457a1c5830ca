package graft.util

import org.apache.spark.sql.DataFrame

/** Rolling persisted-RDD generations for continuously-maintained state
  * tables: each micro-batch's state is the previous generation plus a
  * LocalRelation-sized overlay, truncated to a persisted InternalRow leaf
  * (GraftSqlShims.truncated — no tracked action, no Catalyst checkpoint
  * copy). Generation b feeds generation b+1's pipeline, so releasing all
  * but the newest two is safe once a batch commits; callers keep a
  * periodic eager localCheckpoint as the lineage bound and call clear()
  * after it. */
final class StateRoller {
  private val gens = scala.collection.mutable.Queue
    .empty[Seq[org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]]]

  def roll(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    val wrapped = dfs.map(df => org.apache.spark.sql.GraftSqlShims.truncated(df))
    gens.enqueue(wrapped.map(_._2))
    while (gens.size > 2) gens.dequeue().foreach(_.unpersist(false))
    wrapped.map(_._1)
  }

  def clear(): Unit = {
    gens.foreach(_.foreach(_.unpersist(false))); gens.clear()
  }
}
