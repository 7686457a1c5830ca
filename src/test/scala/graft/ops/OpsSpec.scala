package graft.ops

import org.apache.spark.sql.functions._

import graft.{Oracles, SparkSpec}

/** Training-data pipeline operators vs planted fixtures and brute-force
  * oracles. The driver's DuckDB gate covers the SQL-expressible surface;
  * these tests cover what SQL can't (LSH recall on planted near-dups,
  * SimHash hamming behavior, multimodal plumbing). */
class OpsSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // deterministic corpus with planted exact dups and near-dups
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = "the quick brown fox jumps over the lazy dog near the river bank tonight" // 1 token off
    val other = (0 until 20).map(i =>
      (100L + i, s"document number $i with unique content token$i alpha beta gamma delta " +
        s"epsilon zeta eta theta iota kappa word${i * 7} word${i * 13}"))
    (Seq(
      (1L, base), (2L, base),                  // exact dup pair
      (3L, near),                              // near dup of 1
      (4L, "completely different text about spark catalyst optimizer plans")
    ) ++ other).toDF("doc_id", "text")
  }

  test("exact dedup groups the planted exact duplicates") {
    val groups = Dedup.exactGroups(docs).where(col("n_dups") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_id") == 1L)
    assert(groups.head.getAs[Long]("n_dups") == 2L)
    // keepers = all docs minus one dup
    assert(Dedup.exactKeepers(docs).count() == docs.count() - 1)
  }

  test("n-gram jaccard pairs match brute force on the corpus") {
    import spark.implicits._
    val rows = docs.as[(Long, String)].collect()
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSet
    val want = (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      j = Oracles.jaccard(toks(ta), toks(tb))
      if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.5
    } yield (a, b)).toSet
    val got = Dedup.jaccardPairs(docs, n = 1, threshold = 0.5, maxShingleFreq = Long.MaxValue)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.contains((1L, 2L)) && want.contains((1L, 3L))) // planted pairs found
  }

  test("minhash LSH finds the planted near-dups with exact-verified jaccard") {
    import spark.implicits._
    val got = Dedup.minhashNearDups(docs, n = 1, threshold = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), "exact dup must collide in every band")
    assert(got.contains((1L, 3L)) || got.contains((2L, 3L)), "near dup should be found")
    // precision is exact by construction: every reported pair really has j >= 0.8
    val verified = Dedup.jaccardPairs(docs, 1, 0.8, Long.MaxValue)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(verified))
  }

  test("minhash signatures: identical docs → identical signatures") {
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(docs, n = 1, numPerm = 16)
      .where(col("doc_id").isin(1L, 2L)).collect()
    assert(sigs.length == 2)
    val s1 = sigs.find(_.getLong(0) == 1L).get
    val s2 = sigs.find(_.getLong(0) == 2L).get
    (1 to 16).foreach(i => assert(s1.getLong(i) == s2.getLong(i)))
  }

  test("simhash: exact dups at distance 0; near dups within small distance") {
    import spark.implicits._
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    val distNear = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val distFar = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(distNear < distFar, s"near=$distNear far=$distFar")
    val pairs = Dedup.simhashNearDups(docs, maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("brute-force ANN matches plain-Scala cosine top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 3), k = 5)
      .select("qid", "nid", "rk").as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.sortBy(_._3).map(_._2).toSeq }
    val byId = vecs.toMap
    (0L until 3L).foreach { q =>
      val want = vecs.filter(_._1 != q)
        .map { case (i, v) =>
          (i, BigDecimal(Oracles.cosine(byId(q), v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (i, c) => (-c, i) }.take(5).map(_._1).toSeq
      assert(got(q) == want, s"query $q")
    }
  }

  test("LSH ANN: high recall on clustered vectors, exact scores on what it returns") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // 4 tight clusters of 25 → same-cluster neighbors dominate top-k
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5, vecCol = "embedding")
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, k = 5, nBits = 8, nTables = 6, dim = 16)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF ANN: clustered recall; probing all centroids = exact top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, nCentroids = 8, nProbe = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"ivf recall $recall")
    // probing every centroid degenerates to exact search
    val full = Similarity.ivfTopK(emb, queries, k = 5, nCentroids = 8, nProbe = 8)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }

  test("IVF trained quantizer: recall strictly beats the placeholder at equal nProbe") {
    import spark.implicits._
    // 8 clusters in CONTIGUOUS id blocks with heavy per-vector noise: the
    // placeholder quantizer (lowest-8 ids) picks 8 noisy copies of cluster
    // 0's direction, so per-vector noise decides each assignment and every
    // cluster scatters across buckets; k-means averages the noise away and
    // recovers one coherent centroid per cluster. Intra-cluster cosine
    // (~0.4) still dominates inter-cluster (~N(0, 1/64)), so exact top-k
    // stays within-cluster.
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 240).map { i =>
      val c = centers(i / 30)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 1.2).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding").localCheckpoint(true)
    val queries = emb.where(col("vec_id") >= 200 && col("vec_id") < 208)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recallOf(cents: Option[Array[Array[Double]]]): Double = {
      val got = Similarity.ivfTopK(emb, queries, k = 10, nCentroids = 8,
        nProbe = 1, centroids = cents)
        .select("qid", "nid").as[(Long, Long)].collect().toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val trained = Similarity.trainCentroids(emb, nCentroids = 8,
      sampleSize = 240, iters = 8)
    val rTrained = recallOf(Some(trained))
    val rPlaceholder = recallOf(None)
    assert(rTrained > rPlaceholder,
      s"trained recall $rTrained must beat placeholder $rPlaceholder")
    assert(rTrained >= 0.95, s"trained recall $rTrained on separable clusters")
    // training is deterministic: same inputs → identical centroids
    val again = Similarity.trainCentroids(emb, nCentroids = 8,
      sampleSize = 240, iters = 8)
    assert(trained.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("embedding cosine near-dup: planted duplicate vector found") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val v0 = Array.fill(16)(rnd.nextGaussian().toFloat)
    val vecs = Seq((0L, v0), (1L, v0.map(x => x * 1.001f))) ++
      (2L until 30L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDups(emb, threshold = 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("text analysis columns are deterministic and sane") {
    import spark.implicits._
    val d = Seq((1L, "The cat and the dog. Bien sur!")).toDF("doc_id", "text")
    val q = TextAnalysis.qualityColumns(d).head()
    assert(q.getAs[Int]("n_tokens") == 7)
    assert(q.getAs[Int]("punct_cnt") == 2) // '.' and '!'
    val l = TextAnalysis.langIdColumns(d).select("pred_lang").head().getString(0)
    assert(l == "en") // 'the' + 'and' markers dominate
    val fp1 = d.select(TextAnalysis.fingerprint(col("text"))).head().getString(0)
    val fp2 = Seq((2L, "the  cat and THE dog. bien   sur!")).toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint(col("text"))).head().getString(0)
    assert(fp1 == fp2, "fingerprint is case/whitespace-normalized")
  }

  test("multimodal plumbing: schema, determinism, frame sampling") {
    import spark.implicits._
    val media = Multimodal.fakePayload(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta1 = Multimodal.decodeMeta(spark, media).collect().sortBy(_.doc_id)
    val meta2 = Multimodal.decodeMeta(spark, media).collect().sortBy(_.doc_id)
    assert(meta1.toSeq == meta2.toSeq) // deterministic stub
    assert(meta1.forall(m => m.n_bytes > 0 && m.width >= 16 && m.n_frames >= 1))
    val frames = Multimodal.sampleFrames(
      Multimodal.decodeMeta(spark, media).toDF(), stride = 2)
    val perDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    meta1.foreach(m => assert(perDoc(m.doc_id) == (m.n_frames + 1) / 2))
    val feats = Multimodal.extractFeatures(spark, media, dim = 8).collect()
    assert(feats.forall(_.feature.length == 8))
  }
}
