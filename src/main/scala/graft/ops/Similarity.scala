package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers, per the scale plan:
  *  - `bruteForceTopK`: exact cosine top-k — the baseline and the oracle.
  *    Dot products run as codegen'd `zip_with`+`aggregate` array expressions
  *    (no UDF, no posexplode shuffle): one broadcast of the (small) query
  *    set against a linear scan of the corpus.
  *  - `lshTopK`: random-hyperplane LSH (sign sketch) — corpus and queries
  *    hash to sign-pattern buckets; only same-bucket (or near-bucket via
  *    multiple tables) pairs pay the exact cosine. This is the 100 TB path:
  *    bucket join instead of cross join.
  *
  * Hyperplanes are generated driver-side from a fixed seed — deterministic
  * across runs and parallelism levels.
  */
object Similarity {

  /** Cosine similarity between two float-array columns as a double Column
    * (computed in double; arrays must be same length). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Exact top-k cosine neighbors of each query vector (queries = rows of
    * `queries` DataFrame with (qid, embedding)). Excludes self-matches by
    * id. Scores rounded to 6 decimals BEFORE ranking so results are
    * deterministic across summation orders (and across engines — the DuckDB
    * oracle computes the same rounded value); ties break by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = q.crossJoin(c)
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", round(cosine(col("qvec"), col("nvec")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rk"))
  }

  /** Deterministic random hyperplanes: `nPlanes` × `dim`, seeded. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-sketch bucket id for a vector column under the given hyperplanes:
    * bit i = sign(v · h_i). Pure column expression (planes inlined as array
    * literals — small, broadcast with the plan). */
  def signSketch(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(zip_with(vec, planeLit, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: `nTables` independent sign sketches of
    * `nBits` planes each; candidates = same (table, bucket); exact cosine +
    * per-query top-k on candidates only. Recall grows with nTables; cost is
    * bucket-join-shaped, never all-pairs. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nBits: Int = 12, nTables: Int = 4, dim: Int = 64, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding",
              maxBucketSize: Long = 100000L): DataFrame = {
    def buckets(df: DataFrame, id: String, vec: String): DataFrame = {
      val tableCols = (0 until nTables).map { t =>
        struct(lit(t).as("tbl"),
          signSketch(col(vec), hyperplanes(nBits, dim, seed + t)).as("bkt"))
      }
      df.select(col(id), col(vec), explode(array(tableCols: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    }
    val qb = buckets(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")), "qid", "qvec")
    // cap the CORPUS side: a degenerate bucket (e.g. all-zero vectors) would
    // otherwise fan every query colliding with it across the whole corpus.
    // The sketch computation (nTables x nBits dot products per vector) is
    // materialized once so the cap scan doesn't re-evaluate it.
    val cb = Dedup.capBuckets(
      buckets(corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nid", "nvec")
        .localCheckpoint(true),
      Seq("tbl", "bkt"), maxBucketSize)
    val cands = qb.join(cb, Seq("tbl", "bkt"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("qvec"), col("nid"), col("nvec"))
      .dropDuplicates("qid", "nid")
    val scored = cands.withColumn("cos", round(cosine(col("qvec"), col("nvec")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rk"))
  }

  /** IVF-flat approximate top-k — the inverted-file ANN scale path: a small
    * COARSE QUANTIZER (here: the nCentroids lowest-id vectors, deterministic
    * and oracle-computable; a k-means refinement drops in without changing
    * the plan shape) partitions the corpus into buckets by
    * nearest-centroid assignment (one broadcast pass, |corpus| × K rows);
    * each query probes its `nProbe` nearest centroids and pays exact cosine
    * only inside those buckets. Complements sign-sketch LSH: IVF buckets
    * adapt to the data distribution, LSH buckets are data-independent. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = broadcast(corpus.select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .orderBy(col("cid")).limit(nCentroids))
    def nearestCentroids(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("ccos").desc, col("cid").asc)
      df.crossJoin(cent)
        .withColumn("ccos", round(cosine(col(vec), col("cvec")), 6))
        .withColumn("crk", row_number().over(w))
        .where(col("crk") <= n)
        .select(col(id), col(vec), col("cid"))
    }
    val assigned = nearestCentroids(
      corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nid", "nvec", 1)
    val probes = nearestCentroids(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")), "qid", "qvec", nProbe)
    val cands = probes.join(assigned, Seq("cid"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("qvec"), col("nid"), col("nvec"))
      .dropDuplicates("qid", "nid")
    val scored = cands.withColumn("cos", round(cosine(col("qvec"), col("nvec")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    * Exact (cross-join) — use for verification scales; the LSH variant
    * (`lshNearDups`) is the scale path. */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** LSH-bucketed near-dup pairs — same output contract as cosineNearDups
    * but candidates from sign-sketch buckets (approximate recall). */
  def lshNearDups(corpus: DataFrame, threshold: Double,
                  nBits: Int = 8, nTables: Int = 6, dim: Int = 64, seed: Long = 42L,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  maxBucketSize: Long = 100000L): DataFrame = {
    val tableCols = (0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        signSketch(col(vecCol), hyperplanes(nBits, dim, seed + t)).as("bkt"))
    }
    // sketches materialized once (cap scan + both self-join sides reuse)
    val raw = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
        explode(array(tableCols: _*)).as("tb"))
      .select(col("id"), col("vec"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
      .localCheckpoint(true)
    val bk = Dedup.capBuckets(raw, Seq("tbl", "bkt"), maxBucketSize)
    bk.as("x").join(bk.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bkt") === col("y.bkt") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.vec").as("va"), col("y.vec").as("vb"))
      .dropDuplicates("a", "b")
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
