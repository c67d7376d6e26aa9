package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Non-parity extras (reference DEAD code rebuilt as opt-in library
  * surface — SURVEY.md §0 / round-1 VERDICT "What's missing" #3). */
class ExtrasSpec extends AnyFunSuite {

  test("getLCS: classic cases (similarity.ts:25-57)") {
    assert(Extras.getLCS("abcde", "ace") == "ace")
    assert(Extras.getLCS("AGGTAB", "GXTXAYB") == "GTAB")
    assert(Extras.getLCS("", "abc") == "")
    assert(Extras.getLCS("same", "same") == "same")
  }

  test("getEditDistance: classic cases (similarity.ts:62-87)") {
    assert(Extras.getEditDistance("kitten", "sitting") == 3)
    assert(Extras.getEditDistance("", "abc") == 3)
    assert(Extras.getEditDistance("flaw", "lawn") == 2)
    assert(Extras.getEditDistance("same", "same") == 0)
  }

  test("cleanHtml strips scripts, styles, stylesheet links, comments") {
    val doc = HtmlParser.parse(
      """<html><head><style>x{}</style><link rel="stylesheet" href="a.css"><link rel="icon" href="i"></head>
        |<body><p>keep</p><script>var x=1;</script><!-- gone --></body></html>""".stripMargin)
    Extras.cleanHtml(doc)
    val html = doc.outerHtml
    assert(!html.contains("<script"))
    assert(!html.contains("<style"))
    assert(!html.contains("stylesheet"))
    assert(html.contains("rel=\"icon\"")) // only stylesheet links removed
    assert(!html.contains("gone"))
    assert(html.contains("keep"))
  }

  test("scoreElement: exact integers (extractor.ts:72-111)") {
    // article tag (30) + class 'post-content' matches patterns 1 only
    // ... 'content' and 'post' are the SAME pattern (one +25), no
    // main/body, no entry/blog; 250 chars text (+2); 1 p (+5); 0 img
    val e = Dom.element("article", "class" -> "post-content")
    val p = new Element("p")
    p.appendChild(new TextNode("x" * 250))
    e.appendChild(p)
    assert(Extras.scoreElement(e) == 30 + 25 + 2 + 5)
    // div + id 'main' hits pattern 2 (+25) and nothing else
    val d = Dom.element("div", "id" -> "main")
    assert(Extras.scoreElement(d) == 5 + 25)
  }

  test("hasValidLinks: anchors and javascript: links don't count") {
    val e = HtmlParser.parse(
      "<div><a href=\"#top\">t</a><a href=\"javascript:void(0)\">j</a><a href=\"/x\"> </a></div>")
    assert(!Extras.hasValidLinks(e)) // third link has empty text
    val ok = HtmlParser.parse("<div><a href=\"/x\">real</a></div>")
    assert(Extras.hasValidLinks(ok))
  }

  test("normalizeMedia: data-src promote, external-link hardening, td->th") {
    val e = HtmlParser.parse(
      """<div><img data-src="lazy.png"><a href="http://x.com">x</a>
        |<table><tr><td>h1</td><td>h2</td></tr><tr><td>v</td></tr></table></div>""".stripMargin)
    Extras.normalizeMedia(e)
    val img = e.select("img").head
    assert(img.attr("src").contains("lazy.png"))
    val a = e.select("a").head
    assert(a.attr("target").contains("_blank"))
    assert(a.attr("rel").contains("noopener noreferrer"))
    assert(e.select("th").length == 2) // first row only
    assert(e.select("td").length == 1)
  }

  test("configurable weights: defaultConfig tables drive calculateNodeScore (extractor.ts:187-232)") {
    val e = Dom.element("article", "class" -> "content")
    val p = new Element("p")
    p.appendChild(new TextNode("x" * 250))
    e.appendChild(p)
    // defaultConfig: tag article=30, class content=25; live: 10 + 8.
    // shared terms: text 250 → +2, 1 <p> → +1, no links/imgs/headings
    val dc = new BaseExtractor(ExtractOptions(weights = ScoreWeights.DefaultConfig))
    assert(dc.calculateNodeScore(e) == 30 + 25 + 2 + 1)
    val live = new BaseExtractor()
    assert(live.calculateNodeScore(e) == 10 + 8 + 2 + 1)
  }

  test("configurable weights: override flips the heuristic-argmax winner end-to-end") {
    // two stage-4 candidates with byte-identical inner content (equal
    // content-score extras) whose class/tag weights ORDER DIFFERENTLY
    // between the live and defaultConfig tables:
    //   <div class="content">:    live 4+8=12   defaultConfig 5+25=30
    //   <section class="text">:   live 6+4=10   defaultConfig 25+25=50
    // neither matches any stage-2/3 selector → findBestNode decides.
    def para(w: String) = s"<p>${(w + " ") * 12}end.</p>"
    def body(w: String) = para(w) * 6
    val html =
      s"""<html><body>
         |<div class="content">${body("alpha")}</div>
         |<section class="text">${body("bravo")}</section>
         |</body></html>""".stripMargin
    val live = new BaseExtractor().extract(html, "https://example.com/w")
    assert(live.metrics.fallbackStage == 4)
    assert(live.textContent.startsWith("alpha"))
    val dc = new BaseExtractor(ExtractOptions(weights = ScoreWeights.DefaultConfig))
      .extract(html, "https://example.com/w")
    assert(dc.metrics.fallbackStage == 4)
    assert(dc.textContent.startsWith("bravo"))
  }

  test("ReadabilityPlus: argmax candidate wins; linkless page yields None (ref quirk)") {
    val html =
      """<html><body>
        |<div class="sidebar">short <a href="/s">s</a></div>
        |<article class="post-content"><p>%s</p><a href="/more">read more</a></article>
        |</body></html>""".stripMargin.format("Long enough body text for the readability candidate. " * 6)
    val doc = HtmlParser.parse(html)
    val best = new ReadabilityPlus().parse(doc)
    assert(best.exists(_.tag == "article"))
    // without any valid link no candidate qualifies — reference quirk
    val linkless = HtmlParser.parse(
      "<html><body><article class=\"post-content\"><p>" +
        ("Plenty of text but not a single hyperlink anywhere here. " * 6) +
        "</p></article></body></html>")
    assert(new ReadabilityPlus().parse(linkless).isEmpty)
  }
}
