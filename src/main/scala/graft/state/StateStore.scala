package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-superstep metrics recorded in the lineage manifest (north rule:
  * partition id, iteration, row counts, delta norms). The reference's
  * analogue is its counter/timer report (ParaCOSM/CSM/matching/matching.h:
  * 25-33, main.cpp:848-868) — but written durably per iteration, which the
  * reference cannot do (in-memory only; crash = restart, SURVEY §2.11). */
final case class PartitionLineage(partitionId: Int, rowCount: Long)

final case class SnapshotManifest(
    name: String,
    iteration: Int,
    rowCount: Long,
    deltaL1: Double,
    deltaLinf: Double,
    changed: Long,
    wallMs: Long,
    partitions: Seq[PartitionLineage],
    byteSize: Long = 0L) {

  def toJson: String = {
    val parts = partitions
      .map(p => s"""{"partitionId":${p.partitionId},"rowCount":${p.rowCount}}""")
      .mkString("[", ",", "]")
    s"""{"name":"$name","iteration":$iteration,"rowCount":$rowCount,""" +
      s""""deltaL1":$deltaL1,"deltaLinf":$deltaLinf,"changed":$changed,""" +
      s""""wallMs":$wallMs,"byteSize":$byteSize,"partitions":$parts}"""
  }
}

/** Iceberg-semantics snapshot store on Parquet + JSON manifests.
  *
  * No Iceberg runtime jar exists in this image (zero-egress), so this class
  * mirrors the semantics we need from it — immutable snapshot directories,
  * atomic commit (manifest written last, data dir renamed into place), and
  * per-partition lineage — behind a small API that a true Iceberg binding
  * could replace one class at a time (SURVEY.md §7.0).
  *
  * Layout: `$root/$name/it=$k/data/` (parquet) + `$root/$name/it=$k/manifest.json`.
  * A snapshot is committed iff its manifest exists; `latestCompleted` ignores
  * torn writes, which is what makes mid-iteration kills resumable.
  */
final class StateStore(val root: String) {

  private def dir(name: String, it: Int): Path = Paths.get(root, name, s"it=$it")

  /** Write one superstep snapshot atomically and return the re-read frame
    * (re-reading truncates Catalyst lineage — without this, iteration k's
    * plan references all k-1 predecessors and analysis time explodes,
    * SURVEY.md §7.4-1). */
  def commit(spark: SparkSession, name: String, iteration: Int, df: DataFrame,
             deltaL1: Double = 0.0, deltaLinf: Double = 0.0, changed: Long = 0L,
             wallMs: Long = 0L): DataFrame = {
    val target = dir(name, iteration)
    val tmp = Paths.get(root, name, s".tmp-it=$iteration-${System.nanoTime()}")
    Files.createDirectories(tmp)
    val dataTmp = tmp.resolve("data")
    df.write.mode("overwrite").parquet(dataTmp.toString)

    // Lineage from the re-read parquet (one cheap columnless scan) — NOT
    // from `df`, which would re-run the full upstream plan a second time
    // (at 100× scale that doubles every committed superstep) and would
    // describe the pre-write computation rather than the stored snapshot.
    val perPart = spark.read.parquet(dataTmp.toString)
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => PartitionLineage(r.getInt(0), r.getLong(1)))
      .sortBy(_.partitionId).toSeq
    // memory/storage-cost aggregate (reference counters report peak RSS,
    // utils/utils.h:38-67; here: exact on-disk snapshot bytes)
    val byteSize = {
      val s = Files.walk(dataTmp)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
      finally s.close()
    }
    val manifest = SnapshotManifest(name, iteration, perPart.map(_.rowCount).sum,
      deltaL1, deltaLinf, changed, wallMs, perPart, byteSize)

    // Commit protocol: data first, manifest last, then atomic dir rename.
    Files.writeString(tmp.resolve("manifest.json"), manifest.toJson)
    deleteRecursively(target)
    Files.createDirectories(target.getParent)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    spark.read.parquet(target.resolve("data").toString)
  }

  /** Highest iteration with a committed manifest, or -1. Torn snapshots
    * (data without manifest) are invisible here — resume skips them. */
  def latestCompleted(name: String): Int = {
    val base = Paths.get(root, name)
    if (!Files.isDirectory(base)) return -1
    val stream = Files.list(base)
    val its =
      try stream.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("it="))
        .filter(p => Files.exists(p.resolve("manifest.json")))
        .map(_.getFileName.toString.stripPrefix("it=").toInt)
        .toSeq
      finally stream.close() // unclosed Files.list leaks a directory fd
    if (its.isEmpty) -1 else its.max
  }

  def load(spark: SparkSession, name: String, iteration: Int): DataFrame =
    spark.read.parquet(dir(name, iteration).resolve("data").toString)

  def manifestJson(name: String, iteration: Int): String =
    Files.readString(dir(name, iteration).resolve("manifest.json"))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  private implicit class IterScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
