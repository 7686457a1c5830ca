package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucket-size caps on every LSH self-join: an adversarial corpus that
  * collapses into one bucket must not re-introduce the quadratic all-pairs
  * blowup — over-full buckets are dropped (and countable, never silent). */
class CapSpec extends SparkSpec {

  private def adversarialDocs(n: Int) = {
    import spark.implicits._
    // identical one-sentence docs: every band/chunk/sketch collides
    (0 until n).map(i => (i.toLong, "the same tiny document text"))
      .toDF("doc_id", "text")
  }

  test("minhash LSH: over-full band buckets are dropped by the cap") {
    val docs = adversarialDocs(60)
    // uncapped: all 60 docs pair up (59*60/2 = 1770 pairs, jaccard 1.0)
    val uncapped = Dedup.minhashNearDups(docs, n = 1, threshold = 0.8).count()
    assert(uncapped == 1770L)
    // capped below the bucket size: the degenerate bucket is dropped wholesale
    val capped = Dedup.minhashNearDups(docs, n = 1, threshold = 0.8,
      maxBucketSize = 10L).count()
    assert(capped == 0L)
  }

  test("bucketCapStats reports dropped buckets (no silent caps)") {
    import spark.implicits._
    val buckets = ((0 until 50).map(i => (i.toLong, 0, 7L)) ++ // one hot bucket
      Seq((100L, 1, 8L), (101L, 1, 8L), (102L, 1, 9L))).toDF("doc_id", "band", "bh")
    val (kept, dropped) = Dedup.bucketCapStats(buckets, Seq("band", "bh"), cap = 10L)
    assert(kept == 2L && dropped == 1L)
    assert(Dedup.capBuckets(buckets, Seq("band", "bh"), 10L).count() == 3L)
  }

  test("simhash cap drops the degenerate chunk buckets") {
    val docs = adversarialDocs(40)
    assert(Dedup.simhashNearDups(docs, maxDist = 3).count() == 780L)
    assert(Dedup.simhashNearDups(docs, maxDist = 3, maxBucketSize = 8L).count() == 0L)
  }

  test("embedding LSH caps: identical vectors collapse to one droppable bucket") {
    import spark.implicits._
    val emb = (0 until 30).map(i => (i.toLong, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val uncapped = Similarity.lshNearDups(emb, threshold = 0.9, nBits = 4,
      nTables = 2, dim = 8).count()
    assert(uncapped == 435L)
    val capped = Similarity.lshNearDups(emb, threshold = 0.9, nBits = 4,
      nTables = 2, dim = 8, maxBucketSize = 5L).count()
    assert(capped == 0L)
    val topkCapped = Similarity.lshTopK(emb, emb.where(col("vec_id") < 2), k = 5,
      nBits = 4, nTables = 2, dim = 8, maxBucketSize = 5L).count()
    assert(topkCapped == 0L)
  }
}
