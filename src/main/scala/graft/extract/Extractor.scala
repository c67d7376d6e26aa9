package graft.extract

import scala.collection.mutable

/** Extraction options — reference ExtractorOptions
  * (/root/reference/app/types/extractor.ts:19-24; defaults
  * BaseExtractor.ts:62-72; per-extractor overrides in each
  * subclass constructor). `retryLength`/`includeComments` are carried
  * but never read, matching the reference.
  */
final case class ExtractOptions(
    minTextLength: Int = 25,
    retryLength: Int = 250,
    includeComments: Boolean = false,
    minScore: Int = 20,
    /** NON-PARITY mode: run the six stage-1 content probes the
      * reference *intended* (BaseExtractor.ts:605-634 — its XPath→CSS
      * rewrite produces invalid selectors, the catch swallows the
      * error, and stage 1 always yields null). Default false =
      * bug-compatible no-op stage 1. */
    fixedXpathStage: Boolean = false,
    /** Scoring weight tables consumed by calculateNodeScore. Default
      * [[ScoreWeights.Live]] = the reference's live hard-coded tables
      * (BaseExtractor.ts:8-40) — parity untouched.
      * [[ScoreWeights.DefaultConfig]] wires the reference's DEAD
      * `defaultConfig.weights` (app/config/extractor.ts:187-232 —
      * exported but never read by any live code path) as an actually
      * usable configurable-weights mode (non-parity). */
    weights: ScoreWeights = ScoreWeights.Live)

/** Node-scoring weight tables (tag / positive-class / negative-class),
  * overridable per [[ExtractOptions]]. */
final case class ScoreWeights(
    tags: Map[String, Int],
    positiveClasses: Map[String, Int],
    negativeClasses: Map[String, Int])

object ScoreWeights {
  /** The LIVE tables every reference extraction actually uses
    * (BaseExtractor.ts:8-40). */
  val Live: ScoreWeights = ScoreWeights(
    tags = Map(
      "article" -> 10, "main" -> 8, "section" -> 6, "div" -> 4,
      "p" -> 3, "pre" -> 3, "code" -> 3, "blockquote" -> 2,
      "figure" -> 2, "table" -> 2),
    positiveClasses = Map(
      "article" -> 8, "content" -> 8, "post" -> 6, "entry" -> 6,
      "text" -> 4, "body" -> 4),
    negativeClasses = Map(
      "sidebar" -> -8, "comment" -> -6, "advertisement" -> -8, "ad" -> -8,
      "nav" -> -6, "footer" -> -6, "header" -> -4))

  /** The reference's dead `defaultConfig.weights` tables
    * (app/config/extractor.ts:188-232), rebuilt as a usable override
    * — the last unrebuilt piece of reference dead code (round-2
    * VERDICT "What's missing" #1). */
  val DefaultConfig: ScoreWeights = ScoreWeights(
    tags = Map(
      "article" -> 30, "section" -> 25, "main" -> 20, "div" -> 5,
      "p" -> 3, "pre" -> 3, "blockquote" -> 3, "td" -> -3,
      "form" -> -10, "ol" -> 3, "ul" -> 3, "li" -> 1),
    positiveClasses = Map(
      "article" -> 25, "content" -> 25, "post" -> 25, "text" -> 25,
      "body" -> 25, "main" -> 20, "primary" -> 20, "entry" -> 15,
      "story" -> 15, "blog" -> 15),
    negativeClasses = Map(
      "comment" -> -20, "meta" -> -20, "footer" -> -20, "footnote" -> -20,
      "sidebar" -> -15, "widget" -> -15, "share" -> -15, "social" -> -15,
      "nav" -> -15, "menu" -> -15, "advertisement" -> -30, "banner" -> -30,
      "ad" -> -30))
}

final case class ExtractMetricsData(
    nodesScored: Int,
    boilerplateRatio: Double,
    fallbackStage: Int)

final case class ExtractResult(
    title: String,
    content: String,
    textContent: String,
    platform: String,
    metadata: Map[String, String],
    metrics: ExtractMetricsData,
    markdown: String = "",
    textFormat: String = "")

/** The single-document extraction engine: a faithful Scala rebuild of
  * the reference's LIVE dataflow (/root/reference/app/lib/
  * BaseExtractor.ts:84-114 — parse → cleanDocument → title → main
  * content cascade → postProcess), with the SURVEY.md §0 effective-
  * semantics decisions baked in:
  *  - the "XPath" stage is a no-op (broken selector rewrite,
  *    BaseExtractor.ts:605-634) → the cascade starts at stage 2;
  *  - preProcess/cleanHtml never run (dead code);
  *  - cleanEmptyNodes removes EVERY childless+textless element —
  *    including <meta>/<img>/<br>/<iframe> — so meta-based title/
  *    metadata and image bonuses never fire on the live path
  *    (`find()` is descendants-only: a bare <img> has no descendant
  *    img; verified against BaseExtractor.ts:166-177);
  *  - base-URL is resolved from the CURRENT document after parse
  *    (the reference reads `this.$` before initializing it —
  *    ArticleExtractor.ts:167-169 — the evident intent is current-doc);
  *  - normalizeContent merges adjacent text nodes with a proper
  *    sibling merge (the reference's `:contains` removal can delete
  *    arbitrary elements, BaseExtractor.ts:191-203);
  *  - forum reorganizeContent is a live no-op (generateUniqueIds only
  *    ran in dead preProcess, so findMainPostId always returns "") —
  *    conversation-level reassembly is a Spark op instead
  *    (graft.pipeline.Reassembly).
  *
  * Instances are stateful per call (droppedNodes, counters) — use one
  * instance per thread/partition, like the reference's cached
  * singletons but partition-scoped (SURVEY.md §7.1).
  */
class BaseExtractor(val options: ExtractOptions = ExtractOptions(),
                    val platform: String = "article") {

  /** BaseExtractor.ts:8-19; overridable via ExtractOptions.weights. */
  protected def TagWeights: Map[String, Int] = options.weights.tags
  /** BaseExtractor.ts:22-29 */
  protected def PositiveClassWeights: Map[String, Int] =
    options.weights.positiveClasses
  /** BaseExtractor.ts:32-40 */
  protected def NegativeClassWeights: Map[String, Int] =
    options.weights.negativeClasses

  protected var doc: Element = _
  /** Main-content element of the LAST extractDoc call — lets the
    * facade render output formats without re-parsing `content`. */
  private[extract] var lastMainContent: Element = _
  private val dropped = mutable.Set.empty[Int] // identity hashes of dropped elements
  private def droppedKey(e: Element): Int = System.identityHashCode(e)
  protected var nodesScored: Int = 0
  protected var fallbackStage: Int = 0

  protected def textLengthOf(e: Element): Int = e.text.trim.length

  // ---- whitespace pre-collapse (every subclass extract,
  //      e.g. ArticleExtractor.ts:161-164) ----
  def preCollapse(html: String): String =
    Regexes.collapseWs(
      html.replace("&nbsp;", " ").replace("&#160;", " ")) // JS \s incl.  

  def extract(html: String, url: String): ExtractResult =
    extractDoc(HtmlParser.parse(preCollapse(html)), url)

  /** Run the pipeline on an already-parsed (pre-collapsed) document. */
  def extractDoc(d: Element, url: String): ExtractResult = {
    doc = d
    dropped.clear()
    nodesScored = 0
    fallbackStage = 0
    val origTextLen = doc.text.trim.length

    preExtract(url) // article: base-href + special-site cleanup

    cleanDocument()
    val title = TitleExtract.extract(doc)
    val mainContent = extractMainContent()
    postProcess(mainContent)
    lastMainContent = mainContent

    val content = mainContent.innerHtml
    val textContent = mainContent.text.trim
    val boilerplate =
      if (origTextLen <= 0) 0.0
      else math.max(0.0, math.min(1.0,
        1.0 - textContent.length.toDouble / origTextLen))

    ExtractResult(title, content, textContent, platform,
      metadataOf(),
      ExtractMetricsData(nodesScored, boilerplate, fallbackStage))
  }

  protected def preExtract(url: String): Unit = ()
  protected def metadataOf(): Map[String, String] = Map("platform" -> platform)
  protected def getCustomSelectors: Seq[String] = Nil

  // ---- document cleaning (BaseExtractor.ts:119-204) ----

  protected def cleanDocument(): Unit = {
    removeNoiseNodes()
    cleanEmptyNodes()
    normalizeContent()
  }

  protected def removeNoiseNodes(): Unit = {
    Selectors.NoiseSelectors.foreach { sel =>
      doc.select(sel).foreach { e => if (!shouldKeepNode(e)) removeNode(e) }
    }
    doc.select("[style*=\"display: none\"], [style*=\"visibility: hidden\"]")
      .foreach(_.remove())
    doc.select("div:empty, p:empty, span:empty").foreach(_.remove())
  }

  /** BaseExtractor.ts:146-164 */
  protected def shouldKeepNode(e: Element): Boolean = {
    if (e.select("img, video, iframe").nonEmpty) return true
    val text = e.text.trim
    if (text.length > options.minTextLength) {
      val linkText = e.select("a").map(_.text).mkString.trim
      val linkDensity = linkText.length.toDouble / text.length
      linkDensity < 0.5
    } else false
  }

  /** BaseExtractor.ts:166-177 — removes every element with no
    * trimmed text and no descendant img/video/iframe (kills
    * meta/img/br/hr/iframe leaves; see class doc). */
  protected def cleanEmptyNodes(): Unit = {
    val snapshot = doc.descendants.toList
    snapshot.foreach { e =>
      if (e.text.trim.isEmpty && e.select("img, video, iframe").isEmpty)
        e.remove()
    }
  }

  /** BaseExtractor.ts:179-204 (merge rebuilt as proper sibling
    * merge, SURVEY.md §0). */
  protected def normalizeContent(): Unit = {
    def walkTexts(e: Element): Unit = {
      e.children.foreach {
        case t: TextNode => t.data = Regexes.collapseWs(t.data).trim
        case c: Element  => walkTexts(c)
        case _           => ()
      }
    }
    walkTexts(doc)
    def mergeAdjacent(e: Element): Unit = {
      var i = 0
      while (i < e.children.length - 1) {
        (e.children(i), e.children(i + 1)) match {
          case (a: TextNode, b: TextNode) =>
            a.data = (a.data + " " + b.data).trim
            e.children.remove(i + 1)
          case _ => i += 1
        }
      }
      e.childElements.foreach(mergeAdjacent)
    }
    mergeAdjacent(doc)
  }

  /** BaseExtractor.ts:362-386 — guarded delete. */
  protected def removeNode(e: Element): Unit = {
    if (dropped.contains(droppedKey(e))) return
    val textLength = textLengthOf(e)
    val linkLength = e.select("a").headOption.map(textLengthOf).getOrElse(0)
    val linkDensity = linkLength.toDouble / textLength // NaN when 0/0, like JS
    if (linkDensity > 0.5 || textLength < options.minTextLength) {
      e.remove()
      dropped += droppedKey(e)
    }
  }

  // ---- main-content cascade (BaseExtractor.ts:210-242) ----

  protected def extractMainContent(): Element = {
    // stage 1 (XPath) is a live no-op in parity mode — see class doc.
    // With fixedXpathStage on, run the evident intent of the six
    // probes (CSS equivalents of BaseExtractor.ts:609-616).
    if (options.fixedXpathStage) {
      for (sel <- Selectors.FixedXpathProbes) {
        doc.select(sel).headOption match {
          case Some(e) if isValidContent(e) => fallbackStage = 1; return e
          case _                            => ()
        }
      }
    }
    for (sel <- getCustomSelectors) {
      doc.select(sel).headOption match {
        case Some(e) if isValidContent(e) => fallbackStage = 2; return e
        case _                            => ()
      }
    }
    for (sel <- Selectors.ContentSelectors) {
      doc.select(sel).headOption match {
        case Some(e) if isValidContent(e) => fallbackStage = 3; return e
        case _                            => ()
      }
    }
    findBestNode() match {
      case Some(e) => fallbackStage = 4; e
      case None =>
        fallbackStage = 5
        doc.select("body").headOption.getOrElse(doc)
    }
  }

  private val ExcludeTags = Set("nav", "header", "footer", "aside", "style",
    "script", "meta", "link")

  /** BaseExtractor.ts:326-360 */
  protected def isValidContent(e: Element): Boolean = {
    if (ExcludeTags.contains(e.tag)) return false
    if (calculateNodeScore(e) < options.minScore) return false
    val textLength = textLengthOf(e)
    if (textLength < options.minTextLength) return false
    val linkLength = e.select("a").headOption.map(textLengthOf).getOrElse(0)
    val linkDensity = linkLength.toDouble / textLength
    linkDensity <= 0.5
  }

  /** BaseExtractor.ts:639-664 */
  protected def findBestNode(): Option[Element] = {
    var best: Element = null
    var maxScore = -1.0
    doc.select("div, article, section, main").foreach { e =>
      if (!dropped.contains(droppedKey(e))) {
        val score = calculateContentScore(e)
        if (score > maxScore) { maxScore = score; best = e }
      }
    }
    if (best != null && isValidContent(best)) Some(best) else None
  }

  // ---- scoring (BaseExtractor.ts:251-297, 669-726) ----

  /** Base node score — overridden per platform with additive deltas. */
  def calculateNodeScore(e: Element): Int = {
    nodesScored += 1
    var score = 0
    score += TagWeights.getOrElse(e.tag, 0)
    e.classNames.foreach { cn =>
      val lc = cn.toLowerCase
      score += PositiveClassWeights.getOrElse(lc, 0)
      score += NegativeClassWeights.getOrElse(lc, 0)
    }
    val textLength = textLengthOf(e)
    val linkLength = e.select("a").headOption.map(textLengthOf).getOrElse(0)
    val linkDensity = linkLength.toDouble / (if (textLength == 0) 1 else textLength)
    score += math.min(textLength / 100, 10)
    if (linkDensity > 0.5) score -= math.floor(linkDensity * 10).toInt
    score += math.min(e.select("img").length * 2, 8)
    score += math.min(e.select("p").length, 5)
    score += math.min(e.select("h1, h2, h3, h4, h5, h6").length * 2, 6)
    score
  }



  def calculateContentScore(e: Element): Double = {
    var score: Double = calculateNodeScore(e).toDouble
    val textLength = textLengthOf(e)
    val nodeHtml = e.innerHtml
    val nodeLength = nodeHtml.length
    score += textLength.toDouble / (if (nodeLength == 0) 1 else nodeLength) * 10
    var pScore = 0
    e.select("p").foreach { p =>
      val t = p.text.trim
      if (t.length > 50) pScore += 2
      if (Regexes.Punct.matcher(t).find()) pScore += 1
    }
    score += math.min(pScore, 30)
    score += (if (e.select("img").nonEmpty) 5 else 0)
    score += (if (e.select("table").nonEmpty) 5 else 0)
    score += (if (e.select("ul, ol").nonEmpty) 3 else 0)
    score += (if (e.select("pre, code").nonEmpty) 3 else 0)
    score -= e.depth
    val linkText = e.select("a").map(_.text).mkString.trim
    score -= linkText.length.toDouble / (if (textLength == 0) 1 else textLength) * 20
    val htmlLower = nodeHtml.toLowerCase
    Seq("article", "content", "post", "entry", "main", "text").foreach { kw =>
      if (htmlLower.contains(kw)) score += 2
    }
    math.max(0, score)
  }

  // ---- post-processing (BaseExtractor.ts:388-599) ----

  protected def postProcess(element: Element): Unit = {
    cleanAttributes(element)
    element.select("*:empty").foreach(_.remove())
    normalizeContent() // whole-document, like the reference
    processSpecialTags(element)
    processMathFormulas(element)
    processQuotesAndNotes(element)
  }

  /** BaseExtractor.ts:302-321 */
  protected def cleanAttributes(e: Element): Unit = {
    e.attrs.keys.toList.foreach { a =>
      if (!Selectors.KeepAttributes.contains(a.toLowerCase)) e.removeAttr(a)
    }
    e.childElements.foreach(cleanAttributes)
  }

  /** Replace an element's children with a re-parsed HTML string
    * (cheerio `$el.html(str)`). */
  protected def setInnerHtml(e: Element, html: String): Unit = {
    e.children.toList.foreach(_.remove())
    HtmlParser.parseFragment(html).foreach(e.appendChild)
  }

  /** BaseExtractor.ts:547-600 */
  protected def processSpecialTags(elem: Element): Unit = {
    // tables
    elem.select("table").foreach { table =>
      table.select("tr").headOption.foreach { firstRow =>
        firstRow.select("td").foreach { cell =>
          val th = new Element("th")
          cell.children.toList.foreach(th.appendChild)
          if (cell.parent != null) cell.parent.replaceChild(cell, th)
        }
      }
      val wrapper = Dom.element("div", "class" -> "table-responsive")
      table.wrap(wrapper)
      table.addClass("content-table")
    }
    // code blocks
    elem.select("pre, code").foreach { code =>
      val html = code.innerHtml
      if (html.nonEmpty) {
        for (cls <- code.attr("class")) {
          val m = Regexes.Language.matcher(cls)
          if (m.find()) code.setAttr("data-language", m.group(1))
        }
        setInnerHtml(code, html.replace("\n", "<br>").replace(" ", "&nbsp;"))
      }
      code.addClass("content-code")
    }
    // images (dead on the live path — imgs die in cleanEmptyNodes —
    // but exercised by unit tests / non-parity use)
    elem.select("img").foreach { img =>
      img.attr("data-src").orElse(img.attr("data-original"))
        .foreach(ds => img.setAttr("src", ds))
      img.attr("alt").filter(_.nonEmpty).foreach { alt =>
        img.wrap(Dom.element("figure", "class" -> "content-figure"))
        val cap = Dom.element("figcaption", "class" -> "figure-caption")
        HtmlParser.parseFragment(alt).foreach(cap.appendChild)
        val fig = img.parent
        if (fig != null) fig.appendChild(cap)
      }
      img.addClass("img-fluid content-image")
    }
  }

  /** BaseExtractor.ts:414-501 — note the reference applies the
    * `$…$` regex BEFORE `$$…$$`, so display math is consumed as two
    * inline matches first (order-sensitive, bug-compatible). */
  protected def processMathFormulas(elem: Element): Unit = {
    elem.select("span.math-inline, .MathJax_Preview").foreach { m =>
      val tex = m.text.trim
      if (tex.nonEmpty) { m.setAttr("data-tex", tex); m.addClass("math-inline") }
    }
    elem.select("div.math-display, .MathJax_Display").foreach { m =>
      val tex = m.text.trim
      if (tex.nonEmpty) { m.setAttr("data-tex", tex); m.addClass("math-display") }
    }

    def processTextNode(t: TextNode): Unit = {
      var text = t.data
      var changed = false
      def repl(p: java.util.regex.Pattern, mk: String => String): Unit = {
        val m = p.matcher(text)
        if (m.find()) {
          changed = true
          val sb = new StringBuilder
          var last = 0
          do {
            sb.append(text.substring(last, m.start())).append(mk(m.group(1)))
            last = m.end()
          } while (m.find())
          sb.append(text.substring(last))
          text = sb.toString
        }
      }
      repl(Regexes.MathInline,
        f => s"""<span class="math-inline" data-tex="$f">$$$f$$</span>""")
      repl(Regexes.MathDisplay,
        f => s"""<div class="math-display" data-tex="$f">$$$$$f$$$$</div>""")
      repl(Regexes.MathEquation,
        f => s"""<div class="math-display" data-tex="$f">\\begin{equation}$f\\end{equation}</div>""")
      repl(Regexes.MathAlign,
        f => s"""<div class="math-display" data-tex="$f">\\begin{align}$f\\end{align}</div>""")
      if (changed) {
        val parent = t.parent
        if (parent != null) {
          val idx = parent.childIndex(t)
          t.remove()
          val nodes = HtmlParser.parseFragment(text)
          nodes.zipWithIndex.foreach { case (n, k) => parent.insertChild(idx + k, n) }
        }
      }
    }

    def traverse(e: Element): Unit = {
      val snapshot = e.children.toList
      snapshot.foreach {
        case t: TextNode => processTextNode(t)
        case c: Element  => traverse(c)
        case _           => ()
      }
    }
    traverse(elem)
  }

  /** BaseExtractor.ts:506-542 */
  protected def processQuotesAndNotes(elem: Element): Unit = {
    elem.select("blockquote").foreach { q =>
      q.addClass("content-quote")
      q.select("cite").foreach(_.addClass("quote-source"))
    }
    elem.select(".footnote, .reference").foreach { n =>
      n.addClass("content-footnote")
      n.select("a").foreach { link =>
        if (link.attr("href").exists(_.startsWith("#")))
          link.addClass("footnote-link")
      }
    }
    elem.select(".sidenote, .marginnote").foreach(_.addClass("content-sidenote"))
  }

  /** `(\s*<br\s*\/?>\s*){3,}` → `<br><br>` on serialized inner HTML
    * (every subclass postProcess tail). */
  protected def collapseBrRuns(elem: Element): Unit = {
    val html = elem.innerHtml
    val replaced = Regexes.BrRuns.matcher(html).replaceAll("<br><br>")
    if (replaced != html) setInnerHtml(elem, replaced)
  }

  /** Shared subclass helper: `\n`→`<br>` in pre/code + a class. */
  protected def recodeCodeBlocks(elem: Element, cls: String): Unit = {
    elem.select("pre, code").foreach { b =>
      val html = b.innerHtml
      if (html.nonEmpty) setInnerHtml(b, html.replace("\n", "<br>"))
      b.addClass(cls)
    }
  }

  /** Shared subclass helper: image container + optional caption div. */
  protected def wrapImages(elem: Element, containerCls: String,
                           captionCls: Option[String]): Unit = {
    elem.select("img").foreach { img =>
      img.wrap(Dom.element("div", "class" -> containerCls))
      captionCls.foreach { cc =>
        img.attr("alt").filter(_.nonEmpty).foreach { alt =>
          val cap = Dom.element("div", "class" -> cc)
          HtmlParser.parseFragment(alt).foreach(cap.appendChild)
          val container = img.parent
          if (container != null) container.appendChild(cap)
        }
      }
    }
  }

  // ---- shared metadata helpers (selector → first text/content) ----

  protected def firstText(selectors: Seq[String]): String = {
    for (sel <- selectors) {
      val matches = doc.select(sel)
      if (matches.nonEmpty) {
        return if (sel.startsWith("meta"))
          matches.head.attr("content").getOrElse("")
        else matches.head.text.trim
      }
    }
    ""
  }

  /** Selector loop with `datetime` attribute preference
    * (ArticleExtractor.ts:128-154 pattern). */
  protected def firstTime(selectors: Seq[String]): String = {
    for (sel <- selectors) {
      val matches = doc.select(sel)
      if (matches.nonEmpty) {
        if (sel.startsWith("meta")) return matches.head.attr("content").getOrElse("")
        if (matches.head.attr("datetime").isDefined)
          return matches.head.attr("datetime").getOrElse("")
        return matches.head.text.trim
      }
    }
    ""
  }

  /** `parseInt(text.replace(/[^0-9]/g, ''))` — None when no digits. */
  protected def parseCount(selectors: Seq[String]): Option[Long] = {
    for (sel <- selectors) {
      val matches = doc.select(sel)
      if (matches.nonEmpty) {
        val digits = matches.head.text.trim.filter(_.isDigit)
        if (digits.nonEmpty) return digits.take(18).toLongOption
      }
    }
    None
  }
}
