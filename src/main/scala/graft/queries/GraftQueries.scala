package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.graph.GraphBuilder
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** The driver-facing query catalogue: one entry per implemented operator
  * (SparkEntry.queries) and, for everything ANSI-SQL-expressible, a DuckDB
  * oracle over the same parquet tables (SparkEntry.oracleSql).
  *
  * Link graphs are derived deterministically from the TPC-H-ish testdata so
  * that BOTH engines can construct the identical graph:
  *  - "procurement graph": customer → supplier (+ID_OFFSET) via orders ⋈
  *    lineitem — directed bipartite; suppliers are all dangling (PageRank's
  *    dangling-mass path is exercised on every run).
  *  - "co-purchase graph": part —— part when two parts share an order,
  *    canonical src < dst — the triangle-rich undirected graph.
  *
  * Cross-engine float discipline: every floating output is rounded (6-8
  * decimals) AFTER all arithmetic, and every ranking orders by the rounded
  * value with an integer tie-break, so shuffle/summation order can never
  * flip a comparison (SURVEY.md §7.4-2).
  */
object GraftQueries {

  private val ID_OFFSET = 1000000L

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ------------------------------------------------------- graph derivation

  /** customer → supplier edges (directed, distinct). */
  def procurementEdges(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = table(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + ID_OFFSET).as("dst"))
      .distinct()
  }

  private val procurementEdgesSql =
    "SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"

  /** part —— part co-purchase edges (src < dst, distinct). */
  def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    l.as("a").join(l.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
  }

  private val copurchaseEdgesSql =
    "SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst FROM lineitem a " +
      "JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"

  private def edgeVertices(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id")).union(edges.select(col("dst").as("id"))).distinct()

  // ---------------------------------------------------------- the catalogue

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- sources / graph build (SURVEY §2.1-2.3) ---
    "q_edges" -> ((s, d) => procurementEdges(s, d).orderBy("src", "dst")),
    "q_degrees" -> ((s, d) =>
      GraphBuilder.degrees(procurementEdges(s, d))
        .select(col("id"), col("outDeg").as("out_deg"), col("inDeg").as("in_deg"))
        .orderBy("id")),

    // --- iterative algorithms (SURVEY §2.4-2.5; north rule) ---
    "q_pagerank" -> ((s, d) => {
      val e = procurementEdges(s, d)
      PageRank.fixedIterations(s, e, edgeVertices(e), iters = 10)
        .select(col("id"), round(col("rank"), 8).as("pr"))
        .orderBy("id")
    }),
    "q_cc" -> ((s, d) => {
      val e = procurementEdges(s, d)
      new ConnectedComponents(maxIter = 60).run(s, e, edgeVertices(e)).state
        .orderBy("id")
    }),
    "q_cc_sizes" -> ((s, d) => {
      val e = procurementEdges(s, d)
      new ConnectedComponents(maxIter = 60).run(s, e, edgeVertices(e)).state
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy("label")
    }),
    "q_triangles" -> ((s, d) => TriangleCount.countTriangles(s, copurchaseEdges(s, d))),
    "q_lp_step" -> ((s, d) => {
      val und = GraphBuilder.undirected(copurchaseEdges(s, d))
      val state0 = edgeVertices(und).withColumn("label", col("id"))
      new LabelPropagation().step(und, state0)
        .select(col("id"), col("newLabel").as("new_label"))
        .orderBy("id")
    }),
    "q_labelprop" -> ((s, d) => {
      // full sync LP to (bounded) convergence — labels only; rows-only check
      val e = copurchaseEdges(s, d)
      new LabelPropagation(maxIter = 5).run(s, e, edgeVertices(e)).state.orderBy("id")
    }),

    "q_pagerank_csr" -> ((s, d) => {
      // same 10-iteration recurrence through the CSR-block engine — shares
      // q_pagerank's DuckDB oracle, so the packed path is oracle-gated too
      val e = procurementEdges(s, d)
      val blocks = graft.algo.CsrPageRank.build(s, e, edgeVertices(e))
      val (state, _, _) = graft.algo.CsrPageRank.run(s, blocks, tol = 0.0, maxIter = 10)
      graft.algo.CsrPageRank.toRows(s, state, blocks.verts)
        .select(col("id"), round(col("rank"), 8).as("pr"))
        .orderBy("id")
    }),

    // full pages pipeline on the closed-form fixture (html → extraction →
    // xxhash64 graph → CC + triangles + dangling): the oracle is the
    // closed-form expectation computed by the independent plain-Scala
    // fixture math (FIXTURES.md §2), emitted as SQL literals
    "q_pages_stats" -> ((s, _) => {
      import s.implicits._
      val pages = s.createDataset(graft.pages.PagesFixture.generate(20, 50))
      val (v, e) = GraphBuilder.buildVerified(s, pages)
      val vDF = v.toDF().localCheckpoint(true)
      val eDF = e.toDF().localCheckpoint(true)
      val nPages = vDF.count()
      val nEdges = eDF.count()
      val nComps = new ConnectedComponents(maxIter = 60).run(s, eDF, vDF)
        .state.select("label").distinct().count()
      val nTris = TriangleCount.countTriangles(s, eDF).head().getLong(0)
      val nDangling = vDF.join(eDF.select(col("src").as("id")), Seq("id"), "left_anti").count()
      Seq((nPages, nEdges, nComps, nTris, nDangling))
        .toDF("n_pages", "n_edges", "n_components", "n_triangles", "n_dangling")
    }),

    // --- dedup family (training-data pipeline) ---
    "q_dedup_groups" -> ((s, d) =>
      Dedup.exactGroups(table(s, d, "documents")).orderBy("fp")),
    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(table(s, d, "documents"), n = 1, threshold = 0.5,
        maxShingleFreq = Long.MaxValue).orderBy("a", "b")),
    "q_dedup_minhash" -> ((s, d) =>
      // word 3-gram shingles: distinctive on small-vocab corpora (token sets
      // would make nearly every pair an LSH candidate — quadratic blowup)
      Dedup.minhashNearDups(table(s, d, "documents"), n = 3, threshold = 0.8)
        .orderBy("a", "b")),
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashNearDups(table(s, d, "documents"), maxDist = 3).orderBy("a", "b")),

    // --- text analysis (training-data pipeline) ---
    "q_doc_tokens" -> ((s, d) =>
      table(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"))
        .orderBy("doc_id")),
    "q_doc_quality" -> ((s, d) =>
      TextAnalysis.qualityColumns(table(s, d, "documents"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("punct_cnt").cast("long").as("punct_cnt"),
          col("alpha_ratio"), col("avg_token_len"))
        .orderBy("doc_id")),
    "q_langid" -> ((s, d) =>
      TextAnalysis.langIdColumns(table(s, d, "documents"))
        .select(col("doc_id"), col("s_de").cast("long").as("s_de"),
          col("s_en").cast("long").as("s_en"), col("s_es").cast("long").as("s_es"),
          col("s_fr").cast("long").as("s_fr"), col("s_zh").cast("long").as("s_zh"),
          col("pred_lang"))
        .orderBy("doc_id")),
    "q_fingerprint" -> ((s, d) =>
      table(s, d, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp")).orderBy("doc_id")),

    // --- similarity search ---
    "q_ann_topk" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 10)
        .select(col("qid"), col("nid"), col("cos"), col("rk").cast("long").as("rk"))
        .orderBy("qid", "rk")
    }),
    "q_ann_lsh" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 5), k = 10,
        nBits = 6, nTables = 8)
        .select(col("qid"), col("nid"), col("cos"), col("rk").cast("long").as("rk"))
        .orderBy("qid", "rk")
    }),
    "q_embed_sim_pairs" -> ((s, d) =>
      Similarity.cosineNearDups(table(s, d, "embeddings"), threshold = 0.35)
        .orderBy("a", "b")),

    // --- multimodal plumbing (stubbed decode; real schema/batch shape) ---
    "q_media_meta" -> ((s, d) => {
      val media = Multimodal.fakePayload(table(s, d, "documents"), "doc_id", "text")
      Multimodal.decodeMeta(s, media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("format"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id")
    }),

    // --- windowed / sessionized event analytics (streaming semantics, batch) ---
    "q_events_window" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
        .orderBy("hour", "event_type")),
    "q_events_sessions" -> ((s, d) => {
      val ev = table(s, d, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev", lag(unix_timestamp(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            unix_timestamp(col("ts")) - col("prev") > 1800, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    })
  )

  // --------------------------------------------------------------- oracles

  /** Unrolled fixed-iteration PageRank in ANSI SQL (same recurrence as
    * PageRank.fixedIterations; rounding bridges float noise). */
  private def pagerankSql(iters: Int): String = {
    // MATERIALIZED: the unrolled chain references `e`/`deg` 10× each — without
    // materialization DuckDB inlines the CTE and re-opens the parquet files
    // per reference, tripping "too many open files" under a low ulimit.
    val sb = new StringBuilder
    sb ++= s"WITH e AS MATERIALIZED ($procurementEdgesSql), "
    sb ++= "v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e), "
    sb ++= "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v), "
    sb ++= "deg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY src), "
    sb ++= "r0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM v)"
    for (i <- 1 to iters) {
      sb ++= s", d$i AS MATERIALIZED (SELECT COALESCE(SUM(r.pr), 0.0) AS mass FROM r${i - 1} r " +
        "LEFT JOIN deg ON r.id = deg.id WHERE deg.id IS NULL)"
      sb ++= s", c$i AS MATERIALIZED (SELECT e.dst AS id, SUM(r.pr / deg.outdeg) AS contrib " +
        s"FROM e JOIN r${i - 1} r ON e.src = r.id JOIN deg ON e.src = deg.id GROUP BY e.dst)"
      sb ++= s", r$i AS MATERIALIZED (SELECT v.id, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) + " +
        s"CAST(0.85 AS DOUBLE) * (COALESCE(c.contrib, 0.0) + (SELECT mass FROM d$i) / " +
        s"(SELECT n FROM nn)) AS pr FROM v LEFT JOIN c$i c ON v.id = c.id)"
    }
    sb ++= s" SELECT id, ROUND(pr, 8) AS pr FROM r$iters ORDER BY id"
    sb.toString
  }

  def oracleSql: Map[String, String] = Map(
    "q_edges" -> s"SELECT src, dst FROM ($procurementEdgesSql) ORDER BY src, dst",

    "q_degrees" -> (s"WITH e AS ($procurementEdgesSql), " +
      "o AS (SELECT src AS id, count(*) AS c FROM e GROUP BY src), " +
      "i AS (SELECT dst AS id, count(*) AS c FROM e GROUP BY dst) " +
      "SELECT COALESCE(o.id, i.id) AS id, COALESCE(o.c, 0) AS out_deg, " +
      "COALESCE(i.c, 0) AS in_deg FROM o FULL OUTER JOIN i ON o.id = i.id ORDER BY id"),

    "q_pagerank" -> pagerankSql(10),

    "q_pagerank_csr" -> pagerankSql(10),

    // closed-form fixture expectations (computed independently by the
    // plain-Scala fixture math over FIXTURES.md §2; S=20, P=50)
    "q_pages_stats" -> ("SELECT CAST(1000 AS BIGINT) AS n_pages, " +
      "CAST(2128 AS BIGINT) AS n_edges, CAST(10 AS BIGINT) AS n_components, " +
      "CAST(1218 AS BIGINT) AS n_triangles, CAST(1 AS BIGINT) AS n_dangling"),

    "q_cc" -> (s"WITH RECURSIVE e AS ($procurementEdgesSql), " +
      "u AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e), " +
      "v AS (SELECT DISTINCT src AS id FROM u), " +
      "reach(id, label) AS (SELECT id, id FROM v UNION " +
      "SELECT u.dst, r.label FROM reach r JOIN u ON u.src = r.id) " +
      "SELECT id, min(label) AS label FROM reach GROUP BY id ORDER BY id"),

    "q_cc_sizes" -> (s"WITH RECURSIVE e AS ($procurementEdgesSql), " +
      "u AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e), " +
      "v AS (SELECT DISTINCT src AS id FROM u), " +
      "reach(id, label) AS (SELECT id, id FROM v UNION " +
      "SELECT u.dst, r.label FROM reach r JOIN u ON u.src = r.id), " +
      "cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id) " +
      "SELECT label, count(*) AS n FROM cc GROUP BY label ORDER BY label"),

    "q_triangles" -> (s"WITH e AS ($copurchaseEdgesSql) " +
      "SELECT count(*) AS triangles FROM e e1 " +
      "JOIN e e2 ON e1.dst = e2.src " +
      "JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst"),

    "q_lp_step" -> (s"WITH e AS ($copurchaseEdgesSql), " +
      "u AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e), " +
      "cnt AS (SELECT dst AS id, src AS label, count(*) AS n FROM u GROUP BY dst, src), " +
      "pick AS (SELECT id, label, ROW_NUMBER() OVER " +
      "(PARTITION BY id ORDER BY n DESC, label ASC) AS rn FROM cnt) " +
      "SELECT id, label AS new_label FROM pick WHERE rn = 1 ORDER BY id"),

    "q_dedup_groups" -> ("SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp, " +
      "min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY fp ORDER BY fp"),

    "q_dedup_jaccard" -> ("WITH raw AS (SELECT DISTINCT doc_id, " +
      "unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), " +
      "t AS (SELECT doc_id, tok FROM raw WHERE tok <> ''), " +
      "sz AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY doc_id), " +
      "i AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter FROM t x " +
      "JOIN t y ON x.tok = y.tok AND x.doc_id < y.doc_id GROUP BY x.doc_id, y.doc_id) " +
      "SELECT a, b, ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard " +
      "FROM i JOIN sz sa ON i.a = sa.doc_id JOIN sz sb ON i.b = sb.doc_id " +
      "WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5 ORDER BY a, b"),

    "q_doc_tokens" -> ("SELECT doc_id, " +
      "length(regexp_extract_all(text, '\\S+')) AS n_tokens, " +
      "length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subwords " +
      "FROM documents ORDER BY doc_id"),

    "q_doc_quality" -> ("SELECT doc_id, " +
      "length(regexp_extract_all(text, '\\S+')) AS n_tokens, " +
      "length(regexp_extract_all(text, '[.,!?;:]')) AS punct_cnt, " +
      "ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) " +
      "/ length(text), 6) AS alpha_ratio, " +
      "ROUND(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) " +
      "/ length(regexp_extract_all(text, '\\S+')), 6) AS avg_token_len " +
      "FROM documents ORDER BY doc_id"),

    "q_langid" -> ("SELECT doc_id, " +
      "length(regexp_extract_all(text, '\\b(der|und|die|das|nicht)\\b')) AS s_de, " +
      "length(regexp_extract_all(text, '\\b(the|and|of|to|is)\\b')) AS s_en, " +
      "length(regexp_extract_all(text, '\\b(el|la|de|que|y)\\b')) AS s_es, " +
      "length(regexp_extract_all(text, '\\b(le|les|et|est|une)\\b')) AS s_fr, " +
      "length(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS s_zh, " +
      "CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de' " +
      "WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en' " +
      "WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es' " +
      "WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS pred_lang " +
      "FROM documents ORDER BY doc_id"),

    "q_fingerprint" -> ("SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) " +
      "AS fp FROM documents ORDER BY doc_id"),

    "q_ann_topk" -> ("WITH q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings " +
      "WHERE vec_id < 5), " +
      "qx AS (SELECT qid, generate_subscripts(e, 1) AS idx, unnest(e) AS val FROM q), " +
      "cx AS (SELECT vec_id AS nid, generate_subscripts(embedding, 1) AS idx, " +
      "unnest(embedding) AS val FROM embeddings), " +
      "dots AS (SELECT qid, nid, SUM(CAST(qx.val AS DOUBLE) * CAST(cx.val AS DOUBLE)) AS dot " +
      "FROM qx JOIN cx USING (idx) GROUP BY qid, nid), " +
      "norms AS (SELECT vec_id AS id, SQRT(SUM(CAST(val AS DOUBLE) * CAST(val AS DOUBLE))) " +
      "AS nrm FROM (SELECT vec_id, unnest(embedding) AS val FROM embeddings) GROUP BY vec_id), " +
      "scored AS (SELECT qid, nid, ROUND(dot / (nq.nrm * nc.nrm), 6) AS cos FROM dots " +
      "JOIN norms nq ON qid = nq.id JOIN norms nc ON nid = nc.id WHERE qid <> nid), " +
      "ranked AS (SELECT qid, nid, cos, ROW_NUMBER() OVER (PARTITION BY qid " +
      "ORDER BY cos DESC, nid ASC) AS rk FROM scored) " +
      "SELECT qid, nid, cos, rk FROM ranked WHERE rk <= 10 ORDER BY qid, rk"),

    "q_embed_sim_pairs" -> ("WITH x AS MATERIALIZED (SELECT vec_id, " +
      "generate_subscripts(embedding, 1) AS idx, unnest(embedding) AS val FROM embeddings), " +
      "norms AS MATERIALIZED (SELECT vec_id AS id, " +
      "SQRT(SUM(CAST(val AS DOUBLE) * CAST(val AS DOUBLE))) AS nrm FROM x GROUP BY vec_id), " +
      "dots AS (SELECT a.vec_id AS a, b.vec_id AS b, " +
      "SUM(CAST(a.val AS DOUBLE) * CAST(b.val AS DOUBLE)) AS dot FROM x a " +
      "JOIN x b ON a.idx = b.idx AND a.vec_id < b.vec_id GROUP BY a.vec_id, b.vec_id) " +
      "SELECT a, b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cos FROM dots " +
      "JOIN norms na ON a = na.id JOIN norms nb ON b = nb.id " +
      "WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.35 ORDER BY a, b"),

    "q_events_window" -> ("SELECT date_trunc('hour', ts) AS hour, event_type, " +
      "count(*) AS n, ROUND(SUM(value), 6) AS sum_value FROM events " +
      "GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_events_sessions" -> ("WITH x AS (SELECT user_id, " +
      "CASE WHEN LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL " +
      "OR epoch(ts) - LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800 " +
      "THEN 1 ELSE 0 END AS new_s FROM events) " +
      "SELECT user_id, SUM(new_s) AS n_sessions, count(*) AS n_events FROM x " +
      "GROUP BY user_id ORDER BY user_id")
  )
}
