package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine 60-bit hashing.
  *
  * The engine's default hash everywhere is `xxhash64` (codegen'd, cheapest
  * per byte — the 100 TB path). But the DuckDB correctness oracle cannot
  * compute xxhash64, so every hash-parameterized operator (MinHash, SimHash,
  * LSH banding) also accepts this md5-derived family, which BOTH engines
  * compute bit-identically:
  *
  *   Spark : conv(substring(md5(x), 1, 15), 16, 10) cast long
  *   DuckDB: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)
  *
  * 15 hex digits = 60 bits, always non-negative — no sign-extension
  * divergence between engines, and integer `/ %` arithmetic on it is safe
  * in plain SQL. The hash choice changes constants, never operator shape:
  * oracle-gating the md5 variant gates the same joins/aggregations the
  * xxhash64 variant runs.
  */
object Hashing {

  /** 60-bit non-negative hash of a string/binary column (Spark side). */
  def mdHash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: hash of `value|seed` (decimal seed, '|' separator —
    * unambiguous on tokenized text). */
  def mdHash64Seeded(c: Column, seed: Int): Column =
    mdHash64(concat(c, lit("|" + seed)))

  /** The identical expression in DuckDB SQL, over a SQL expression string. */
  def mdHash64Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  def mdHash64SeededSql(expr: String, seed: Int): String =
    mdHash64Sql(s"concat($expr, '|$seed')")

  /** Plain-JVM twin of `mdHash64` for typed mapPartitions stages (equal to
    * the Spark column expression on UTF-8 input by construction). */
  def mdHash64Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = md.take(8).map(b => f"${b & 0xff}%02x").mkString // 16 hex chars
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Uppercase hex of bytes — equal to Spark's `hex(binaryCol)` and DuckDB's
    * `hex(blob)`. */
  def hexUpperJvm(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString
}
