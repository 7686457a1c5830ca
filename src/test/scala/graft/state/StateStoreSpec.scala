package graft.state

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.algo.PageRank
import graft.graph.GraphBuilder
import graft.pages.PagesFixture

class StateStoreSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-store").toString

  test("commit → latestCompleted → load roundtrip; manifest has lineage") {
    import spark.implicits._
    val store = new StateStore(tmpDir())
    val df = Seq((1L, 0.5), (2L, 0.5)).toDF("id", "rank")
    store.commit(spark, "pr", 1, df, deltaL1 = 0.1, deltaLinf = 0.05, changed = 2L, wallMs = 7L)
    assert(store.latestCompleted("pr") == 1)
    val back = store.load(spark, "pr", 1).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(back == Map(1L -> 0.5, 2L -> 0.5))
    val m = store.manifestJson("pr", 1)
    assert(m.contains("\"iteration\":1") && m.contains("\"rowCount\":2") &&
      m.contains("partitionId") && m.contains("\"deltaLinf\":0.05"))
  }

  test("torn snapshot (data without manifest) is invisible to resume") {
    import spark.implicits._
    val root = tmpDir()
    val store = new StateStore(root)
    store.commit(spark, "pr", 1, Seq((1L, 1.0)).toDF("id", "rank"))
    // simulate a kill mid-iteration-2: data dir exists, manifest missing
    val torn = Paths.get(root, "pr", "it=2")
    Files.createDirectories(torn)
    Seq((1L, 9.9)).toDF("id", "rank").write.parquet(torn.resolve("data").toString)
    assert(store.latestCompleted("pr") == 1)
  }

  test("PageRank resumed from checkpoint equals uninterrupted run (FIXTURES §6.6)") {
    import spark.implicits._
    val pages = spark.createDataset(PagesFixture.generate(4, 10))
    val (v, e) = GraphBuilder.buildVerified(spark, pages)
    val vDF = v.toDF().localCheckpoint(true)
    val eDF = e.toDF().localCheckpoint(true)

    val full = new PageRank(tol = 1e-6).run(spark, eDF, vDF)
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // run only 3 supersteps into a store (simulated kill), then resume
    val store = new StateStore(tmpDir())
    new PageRank(tol = 1e-6, maxIter = 3).run(spark, eDF, vDF, Some(store))
    assert(store.latestCompleted("pagerank") == 3)
    val resumed = new PageRank(tol = 1e-6).resume(spark, eDF, vDF, store)
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(resumed.keySet == full.keySet)
    full.keys.foreach(k => assert(math.abs(resumed(k) - full(k)) < 1e-6))
  }

  test("every superstep committed through a store leaves a manifest chain") {
    import spark.implicits._
    val pages = spark.createDataset(PagesFixture.generate(3, 8))
    val (v, e) = GraphBuilder.buildVerified(spark, pages)
    val store = new StateStore(tmpDir())
    val res = new PageRank(tol = 1e-4).run(spark, e.toDF(), v.toDF(), Some(store))
    (1 to res.iterations).foreach { i =>
      val m = store.manifestJson("pagerank", i)
      assert(m.contains(s"\"iteration\":$i"))
    }
    // delta norms must be monotonically shrinking-ish: last < first
    assert(res.metrics.last.deltaLinf < res.metrics.head.deltaLinf)
  }
}
