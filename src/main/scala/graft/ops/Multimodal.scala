package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batch-shaped decode / feature-extract / resize /
  * frame-sample stages.
  *
  * THE DECODE IS A STUB. No image/audio codec libraries exist in this
  * container, so `StubCodec` derives deterministic fake media properties
  * from the bytes (length + xxhash-style header reads). Everything AROUND
  * the stub is real and tested: the schema contract, the per-partition batch
  * processing shape (mapPartitions — the JVM analogue of `mapInPandas`
  * batching: amortize per-batch codec setup across a whole partition), the
  * partitioning (decode is CPU-heavy ⇒ repartition to cores before the
  * stage), and the typed output columns a real codec would fill in.
  */
object Multimodal {

  /** Typed metadata a decoder emits per blob. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int)

  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  final case class FeatureRow(doc_id: Long, feature: Array[Float])

  /** STUB decoder — deterministic fake, clearly marked. A real build links a
    * codec here; the function signature (bytes → meta) and the surrounding
    * batch shape are the contract.
    *
    * The fake properties derive from a 60-bit md5 hash of the payload's
    * uppercase hex (Hashing.mdHash64/hexUpperJvm) — chosen over a byte-fold
    * so the DuckDB oracle can compute the IDENTICAL values in plain SQL
    * (md5 + integer `/ %` on a non-negative 60-bit int), which is what
    * oracle-gates this pipeline's plumbing end to end. */
  object StubCodec {
    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
      val h = Hashing.mdHash64Jvm(Hashing.hexUpperJvm(bytes)) // 60-bit, >= 0
      val fmt = (h % 3) match { case 0L => "img"; case 1L => "audio"; case _ => "video" }
      MediaMeta(id, bytes.length.toLong, fmt,
        width = (16 + (h / 256L) % 64L).toInt,
        height = (16 + (h / 65536L) % 64L).toInt,
        n_frames = (1 + (h / 16777216L) % 30L).toInt)
    }

    /** Deterministic fake feature vector (a real build returns an embedding). */
    def extractFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L
      bytes.foreach(b => h = h * 31 + b)
      Array.tabulate(dim) { i =>
        val x = h * (i + 1) * 0x9E3779B97F4A7C15L
        (x.toDouble / Long.MaxValue.toDouble).toFloat
      }
    }
  }

  /** Synthesize a deterministic binary payload column from an id + text
    * (stand-in for real crawled media bytes; pure column expr). */
  def fakePayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("payload",
      to_binary(sha2(concat(col(idCol).cast("string"), col(textCol)), 256), lit("hex")))

  /** Decode stage: per-partition batch decode → typed metadata table.
    * mapPartitions so a real codec's init cost is paid once per partition
    * (the Pandas-UDF batch-shape argument, JVM edition). */
  def decodeMeta(spark: SparkSession, media: DataFrame,
                 idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[MediaMeta] = {
    import spark.implicits._
    // decode is CPU-heavy ⇒ spread it over the cores (opt round 6: a
    // compact corpus arrives as ONE input split, and without this exchange
    // the whole decode pass ran in a single task — measured 3.4s → 0.6s at
    // sf0.1). Hash-partitioned on the id: deterministic under task retry.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    media.select(col(idCol).cast("long"), col(payloadCol))
      .repartition(parts, col(idCol)).as[MediaRow]
      .mapPartitions { rows =>
        // real codec: open once here, close at end
        rows.map(r => StubCodec.decodeMeta(r.doc_id, r.payload))
      }
  }

  /** Feature-extraction stage: binary → fixed-dim float vector, batch-shaped
    * like decode. Output schema matches the embeddings table so downstream
    * ANN (Similarity.*) composes directly. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 64,
                      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[FeatureRow] = {
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    media.select(col(idCol).cast("long"), col(payloadCol))
      .repartition(parts, col(idCol)).as[MediaRow]
      .mapPartitions(_.map(r => FeatureRow(r.doc_id, StubCodec.extractFeature(r.payload, dim))))
  }

  /** Frame-sampling stage shape: explode n_frames into (doc_id, frame_idx)
    * rows at a fixed stride — the row-multiplying stage a video pipeline
    * needs; real decode would attach the frame bytes. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.select(col("doc_id"), col("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
}
