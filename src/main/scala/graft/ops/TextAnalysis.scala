package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, all
  * expressed as codegen'd built-in expressions over the `documents` table
  * (doc_id, text, lang, source, n_chars) — no Scala UDFs in the hot path, so
  * every one of these stays inside WholeStageCodegen and scales linearly
  * with a parquet scan.
  */
object TextAnalysis {

  /** Whitespace token count — the cheap token-budget estimator. */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * punctuation marks — a deterministic proxy for tokenizer counts when no
    * vocab is shipped. */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Quality-scoring feature columns (length / punctuation / alpha ratios).
    * Mirrors common public web-corpus quality filters (C4/Gopher-style
    * heuristics). Ratios rounded to 6 decimals for cross-engine stability. */
  def qualityColumns(df: DataFrame, text: String = "text"): DataFrame =
    df.withColumn("n_tokens", regexp_count(col(text), lit("\\S+")))
      .withColumn("punct_cnt", regexp_count(col(text), lit("[.,!?;:]")))
      .withColumn("alpha_ratio",
        round(length(regexp_replace(col(text), "[^A-Za-z]", "")).cast("double") /
          length(col(text)), 6))
      .withColumn("avg_token_len",
        round(length(regexp_replace(col(text), "\\s", "")).cast("double") /
          col("n_tokens"), 6))

  /** Language-ID by stopword-marker scoring (n-gram heuristic): count
    * word-boundary hits of per-language marker words plus a CJK-codepoint
    * count for zh; argmax with deterministic alphabetical tie-break.
    * A heuristic — its contract is determinism and cross-engine
    * reproducibility, not agreement with the `lang` column. */
  def langIdColumns(df: DataFrame, text: String = "text"): DataFrame = {
    val scored = df
      .withColumn("s_de", regexp_count(col(text), lit("\\b(der|und|die|das|nicht)\\b")))
      .withColumn("s_en", regexp_count(col(text), lit("\\b(the|and|of|to|is)\\b")))
      .withColumn("s_es", regexp_count(col(text), lit("\\b(el|la|de|que|y)\\b")))
      .withColumn("s_fr", regexp_count(col(text), lit("\\b(le|les|et|est|une)\\b")))
      .withColumn("s_zh", regexp_count(col(text), lit("[\\x{4e00}-\\x{9fff}]")))
    scored.withColumn("pred_lang",
      when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
        col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), lit("de"))
        .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
          col("s_en") >= col("s_zh"), lit("en"))
        .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), lit("es"))
        .when(col("s_fr") >= col("s_zh"), lit("fr"))
        .otherwise(lit("zh")))
  }

  /** Document fingerprint: md5 over lowercased, whitespace-collapsed text —
    * the canonical-form hash used as the exact-dedup key. (Shingle-level
    * fingerprints for near-dup live in Dedup.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))
}
