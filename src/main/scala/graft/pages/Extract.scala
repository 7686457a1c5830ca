package graft.pages

/** Pure text + link extraction over Common-Crawl-style page HTML.
  *
  * The reference engine consumes a pre-built labeled graph from text files
  * (ParaCOSM/CSM/graph/graph.cpp:217-249); our engine derives the graph from
  * an `input_hint`-shaped pages table (url, warc_ts, html, text, lang), so
  * the extraction step is the analogue of the reference's `LoadFromFile`
  * parser: a deterministic, pure function from raw bytes to structure.
  *
  * The per-row invariant (north rule): `extractText(html) == text`
  * byte-identical per url. Both functions are pure Scala (no Spark types) so
  * they are unit-testable without a session and usable inside a typed
  * `flatMap`/`map` on the executor side.
  */
object Extract {

  private val CommentRe = """(?s)<!--.*?-->""".r
  private val TitleRe   = """(?s)<title>(.*?)</title>""".r
  private val BodyRe    = """(?s)<body[^>]*>(.*?)</body>""".r
  private val TagRe     = """(?s)<[^>]*>""".r
  private val HrefRe    = """<a\s+[^>]*href="([^"]*)"""".r

  /** Strip HTML comments (non-greedy, dotall). A page whose anchors are
    * commented out must yield zero outlinks and no anchor text — this is the
    * dangling-page case of FIXTURES.md §2.5. */
  private[pages] def stripComments(html: String): String =
    CommentRe.replaceAllIn(html, "")

  /** Extract visible text: title, then every tag-free text segment of the
    * body in document order, joined with '\n'. Segments are trimmed; empty
    * segments (inter-tag whitespace) are dropped. Deterministic and
    * byte-exact: no locale, no normalization. */
  def extractText(htmlBytes: Array[Byte]): String =
    extractText(new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8))

  def extractText(html: String): String = {
    val clean = stripComments(html)
    val title = TitleRe.findFirstMatchIn(clean).map(_.group(1).trim)
    val body  = BodyRe.findFirstMatchIn(clean).map(_.group(1)).getOrElse("")
    val segments = TagRe.split(body).iterator.map(_.trim).filter(_.nonEmpty)
    (title.iterator ++ segments).mkString("\n")
  }

  /** Extract outlink target URLs from anchors, resolved against the page's
    * own url. Comments are stripped first. Order preserved; duplicates kept
    * (the edge builder dedups — ParaCOSM dedups on insert, graph.cpp:63-64).
    *
    * Resolution rules (deterministic subset of RFC 3986 sufficient for
    * Common-Crawl-style crawling):
    *  - absolute (`http://`/`https://`): as-is
    *  - protocol-relative `//host/path`: page's scheme + rest
    *  - root-relative `/path`: page's scheme+host + path
    *  - other relative: resolved against the page url's directory
    *  - fragments stripped; empty / `javascript:` / `mailto:` dropped
    */
  def extractLinks(htmlBytes: Array[Byte], pageUrl: String): Seq[String] =
    extractLinks(new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8), pageUrl)

  def extractLinks(html: String, pageUrl: String): Seq[String] = {
    val clean = stripComments(html)
    HrefRe.findAllMatchIn(clean)
      .map(_.group(1))
      .map(raw => raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      })
      .filter(h => h.nonEmpty && !h.startsWith("javascript:") && !h.startsWith("mailto:"))
      .flatMap(resolve(pageUrl, _))
      .toSeq
  }

  /** Resolve a (possibly relative) href against the page url. Pure. */
  private[pages] def resolve(pageUrl: String, href: String): Option[String] = {
    if (href.startsWith("http://") || href.startsWith("https://")) Some(href)
    else {
      val schemeEnd = pageUrl.indexOf("://")
      if (schemeEnd < 0) None
      else {
        val scheme    = pageUrl.substring(0, schemeEnd)
        val afterScheme = pageUrl.substring(schemeEnd + 3)
        val slash     = afterScheme.indexOf('/')
        val host      = if (slash < 0) afterScheme else afterScheme.substring(0, slash)
        if (href.startsWith("//")) Some(s"$scheme:$href")
        else if (href.startsWith("/")) Some(s"$scheme://$host$href")
        else {
          val path = if (slash < 0) "/" else afterScheme.substring(slash)
          val dir  = path.substring(0, path.lastIndexOf('/') + 1)
          Some(s"$scheme://$host$dir$href")
        }
      }
    }
  }
}
