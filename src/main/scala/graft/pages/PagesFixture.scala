package graft.pages

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** One row of the `input_hint`-shaped pages table. */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic synthetic Common-Crawl-style pages fixture (FIXTURES.md §1-2).
  *
  * The reference ships synthetic data generators (data/graph_gen.ipynb:
  * Erdős–Rényi + community labels) and golden v/e text fixtures
  * (README.md:42-83); this is our table-shaped equivalent. The link
  * structure is a pure function of (site, page) ids — NO randomness — so the
  * same (nSites, pagesPerSite) always regenerates the identical graph, and a
  * closed-form expected edge list is available independently of the HTML
  * rendering + extraction path (the two must agree, FIXTURES.md §6.2).
  *
  * Structure per page (s, k), S sites × P pages:
  *  1. chain   (s,k) → (s,(k+1)%P)                 — per-site ring (long diameters)
  *  2. hub     (s,k) → (s,0) for k≠0               — per-site star (power-law hot key)
  *  3. triangle seeds: k%7==0 ⇒ (s,k)→(s,(k+2)%P) and (s,(k+1)%P)→(s,(k+2)%P)
  *  4. bridge  (s,1) → (s+1,1) for even s, s+1<S   — sites pair into components
  *  5. dangling: page (S-1, P-1) renders all anchors inside an HTML comment
  *     ⇒ zero outlinks, one dangling vertex (PageRank dangling-mass path).
  */
object PagesFixture {

  final val Epoch = 1754611200000L // 2025-08-08T00:00:00Z, fixed (no wall clock)

  def url(s: Int, k: Int): String = s"https://site$s.example/p$k"

  /** Closed-form outlink targets of page (s,k), deduped & sorted for
    * determinism. Page (S-1, P-1) has zero outlinks (comment case). */
  def outlinks(s: Int, k: Int, nSites: Int, pagesPerSite: Int): Seq[(Int, Int)] = {
    val P = pagesPerSite
    if (s == nSites - 1 && k == P - 1) Seq.empty
    else {
      val b = scala.collection.mutable.SortedSet.empty[(Int, Int)]
      b += ((s, (k + 1) % P))                        // chain
      if (k != 0) b += ((s, 0))                      // hub (no self loop)
      if (k % 7 == 0) b += ((s, (k + 2) % P))        // triangle seed (own edge)
      if (k >= 1 && (k - 1) % 7 == 0)                // triangle seed closing edge
        b += ((s, (k + 1) % P))                      //   (s,k)=(s,(k0+1)) → (s,k0+2)
      if (k == 1 && s % 2 == 0 && s + 1 < nSites)    // cross-site bridge
        b += ((s + 1, 1))
      b.toSeq.filterNot(_ == ((s, k)))               // never self-loop
    }
  }

  /** The full closed-form directed edge list over urls — the ground truth the
    * extracted edge table must equal exactly (FIXTURES.md §6.2). */
  def expectedEdges(nSites: Int, pagesPerSite: Int): Seq[(String, String)] =
    for {
      s <- 0 until nSites
      k <- 0 until pagesPerSite
      (ts, tk) <- outlinks(s, k, nSites, pagesPerSite)
    } yield (url(s, k), url(ts, tk))

  private val langs = Array("en", "es", "zh", "de")

  private val bodyWords = Array(
    "graph", "edge", "vertex", "rank", "label", "component", "triangle",
    "crawl", "page", "link", "anchor", "site", "web", "index", "spark")

  /** Generate all pages. Body text is seeded-random word soup (the only
    * randomness; link structure is id-determined). `text` is the EXPECTED
    * extraction output, stored so `Extract.extractText(html) == text` is
    * testable per url. */
  def generate(nSites: Int, pagesPerSite: Int, seed: Long = 42L): Seq[Page] = {
    val rnd = new scala.util.Random(seed)
    for {
      s <- 0 until nSites
      k <- 0 until pagesPerSite
    } yield {
      val id    = s * pagesPerSite + k
      val title = s"T${s}_$k"
      val body  = Seq.fill(5 + rnd.nextInt(10))(bodyWords(rnd.nextInt(bodyWords.length))).mkString(" ")
      val links = outlinks(s, k, nSites, pagesPerSite)
      // The dangling page still RENDERS its would-be anchors — inside a
      // comment — so the extractor's comment handling is what produces the
      // dangling vertex, not the generator.
      val renderedLinks =
        if (s == nSites - 1 && k == pagesPerSite - 1)
          outlinksUncommented(s, k, nSites, pagesPerSite)
        else links
      val anchors = renderedLinks.map { case (ts, tk) =>
        s"""<a href="${url(ts, tk)}">to ${ts}_$tk</a>"""
      }.mkString
      val anchorBlock =
        if (s == nSites - 1 && k == pagesPerSite - 1) s"<!--$anchors-->" else anchors
      val html =
        s"<html><head><title>$title</title></head><body><p>$body</p>$anchorBlock</body></html>"
      val anchorTexts =
        if (s == nSites - 1 && k == pagesPerSite - 1) Seq.empty
        else renderedLinks.map { case (ts, tk) => s"to ${ts}_$tk" }
      val text = (Seq(title, body) ++ anchorTexts).mkString("\n")
      Page(url(s, k), new Timestamp(Epoch + id * 1000L), html.getBytes(StandardCharsets.UTF_8),
        text, langs(id % langs.length))
    }
  }

  /** Distributed closed-form edge generator for BENCH scales: the same link
    * structure as `expectedEdges` but produced executor-side from a
    * spark.range (no driver-side HTML materialization — the extraction path
    * is correctness-tested separately at small scale; the bench measures
    * superstep throughput on arbitrarily large graphs). Vertex id = the
    * page ordinal s·P+k (already unique — no hashing needed here). */
  def edgesDistributed(spark: org.apache.spark.sql.SparkSession,
                       nSites: Int, pagesPerSite: Int,
                       parallelism: Int): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import spark.implicits._
    val S = nSites; val P = pagesPerSite
    spark.range(0L, S.toLong * P, 1L, parallelism).as[Long].flatMap { id =>
      val s = (id / P).toInt
      val k = (id % P).toInt
      outlinks(s, k, S, P).map { case (ts, tk) => (id, ts.toLong * P + tk) }
    }
  }

  /** What the dangling page WOULD link to were its anchors not commented. */
  private def outlinksUncommented(s: Int, k: Int, nSites: Int, pagesPerSite: Int): Seq[(Int, Int)] = {
    val P = pagesPerSite
    val b = scala.collection.mutable.SortedSet.empty[(Int, Int)]
    b += ((s, (k + 1) % P))
    if (k != 0) b += ((s, 0))
    if (k % 7 == 0) b += ((s, (k + 2) % P))
    if (k >= 1 && (k - 1) % 7 == 0) b += ((s, (k + 1) % P))
    b.toSeq.filterNot(_ == ((s, k)))
  }
}
