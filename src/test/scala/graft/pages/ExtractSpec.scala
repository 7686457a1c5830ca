package graft.pages

import org.scalatest.funsuite.AnyFunSuite

/** Pure extractor tests — no Spark. The north-rule per-row invariant:
  * extractText(html) == text byte-identical per url (FIXTURES.md §6.1). */
class ExtractSpec extends AnyFunSuite {

  test("extractText == stored text, byte-identical, for every fixture page") {
    val pages = PagesFixture.generate(nSites = 6, pagesPerSite = 15)
    assert(pages.nonEmpty)
    pages.foreach { p =>
      val got = Extract.extractText(p.html)
      assert(got == p.text, s"extraction mismatch for ${p.url}")
      // byte-identical, not just string-equal
      assert(got.getBytes("UTF-8").sameElements(p.text.getBytes("UTF-8")))
    }
  }

  test("extracted links == closed-form outlinks for every fixture page") {
    val S = 6; val P = 15
    val pages = PagesFixture.generate(S, P)
    pages.foreach { p =>
      val got = Extract.extractLinks(p.html, p.url).toSet
      val m = """https://site(\d+)\.example/p(\d+)""".r
      val m(s, k) = p.url
      val want = PagesFixture.outlinks(s.toInt, k.toInt, S, P)
        .map { case (ts, tk) => PagesFixture.url(ts, tk) }.toSet
      assert(got == want, s"links mismatch for ${p.url}")
    }
  }

  test("dangling page has zero outlinks but non-empty text") {
    val S = 4; val P = 8
    val pages = PagesFixture.generate(S, P)
    val dangler = pages.find(_.url == PagesFixture.url(S - 1, P - 1)).get
    assert(Extract.extractLinks(dangler.html, dangler.url).isEmpty)
    assert(Extract.extractText(dangler.html).nonEmpty)
    assert(new String(dangler.html, "UTF-8").contains("<!--"))
  }

  test("comment stripping removes commented anchors only") {
    val html = """<html><head><title>T</title></head><body><p>x</p>""" +
      """<a href="https://a.example/1">keep</a><!--<a href="https://a.example/2">drop</a>--></body></html>"""
    assert(Extract.extractLinks(html, "https://h.example/p") == Seq("https://a.example/1"))
    assert(Extract.extractText(html) == "T\nx\nkeep")
  }

  test("relative href resolution") {
    val base = "https://h.example/dir/page.html"
    assert(Extract.resolve(base, "https://x.example/a") == Some("https://x.example/a"))
    assert(Extract.resolve(base, "//cdn.example/a") == Some("https://cdn.example/a"))
    assert(Extract.resolve(base, "/root.html") == Some("https://h.example/root.html"))
    assert(Extract.resolve(base, "sib.html") == Some("https://h.example/dir/sib.html"))
  }

  test("fragments stripped; javascript/mailto dropped") {
    val html = """<body><a href="https://a.example/x#frag">a</a>""" +
      """<a href="javascript:void(0)">b</a><a href="mailto:x@y.z">c</a></body>"""
    assert(Extract.extractLinks(html, "https://h.example/") == Seq("https://a.example/x"))
  }

  test("fixture determinism: same params → identical pages") {
    val a = PagesFixture.generate(5, 11)
    val b = PagesFixture.generate(5, 11)
    assert(a.map(_.url) == b.map(_.url))
    assert(a.map(_.text) == b.map(_.text))
    assert(a.zip(b).forall { case (x, y) => x.html.sameElements(y.html) })
  }
}
