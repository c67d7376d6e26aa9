package graft.extract

/** NON-PARITY extras: faithful rebuilds of the reference's DEAD code
  * paths (nothing on the live path imports them — SURVEY.md §0), so a
  * user of the reference who *did* wire them up finds them here too.
  * Kept out of BaseExtractor so the parity engine stays exactly the
  * live semantics.
  *
  *  - getLCS / getEditDistance: app/utils/similarity.ts:25-57,62-87
  *  - cleanHtml (script/style/stylesheet-link/comment strip):
  *    app/utils/extractor.ts:9-36
  *  - scoreElement (alternate scorer): app/utils/extractor.ts:72-111
  *  - isMediaNode / hasVisibleContent / hasValidLinks predicates:
  *    app/utils/extractor.ts:43-70
  *  - normalizeText / normalizeMedia: app/utils/extractor.ts:113-171
  *  - ReadabilityPlus alternate pipeline:
  *    app/utils/readability_plus.ts:14-114
  */
object Extras {

  /** Longest common subsequence (similarity.ts:25-57): classic DP with
    * the reference's backtrack tie-break (prefer the i-1 row strictly,
    * else j-1). */
  def getLCS(str1: String, str2: String): String = {
    val m = str1.length; val n = str2.length
    val dp = Array.ofDim[Int](m + 1, n + 1)
    var i = 1
    while (i <= m) {
      var j = 1
      while (j <= n) {
        dp(i)(j) =
          if (str1(i - 1) == str2(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
        j += 1
      }
      i += 1
    }
    val sb = new StringBuilder
    var ii = m; var jj = n
    while (ii > 0 && jj > 0) {
      if (str1(ii - 1) == str2(jj - 1)) { sb.insert(0, str1(ii - 1)); ii -= 1; jj -= 1 }
      else if (dp(ii - 1)(jj) > dp(ii)(jj - 1)) ii -= 1
      else jj -= 1
    }
    sb.toString
  }

  /** Levenshtein distance (similarity.ts:62-87). */
  def getEditDistance(str1: String, str2: String): Int = {
    val m = str1.length; val n = str2.length
    val dp = Array.ofDim[Int](m + 1, n + 1)
    (0 to m).foreach(i => dp(i)(0) = i)
    (0 to n).foreach(j => dp(0)(j) = j)
    var i = 1
    while (i <= m) {
      var j = 1
      while (j <= n) {
        dp(i)(j) =
          if (str1(i - 1) == str2(j - 1)) dp(i - 1)(j - 1)
          else math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1))) + 1
        j += 1
      }
      i += 1
    }
    dp(m)(n)
  }

  /** Script/style/stylesheet-link/comment strip (extractor.ts:9-36) —
    * the cleanup the live path never runs (no caller of preProcess). */
  def cleanHtml(root: Element,
                removeScripts: Boolean = true,
                removeStyles: Boolean = true,
                removeComments: Boolean = true): Unit = {
    if (removeScripts) root.select("script").foreach(_.remove())
    if (removeStyles) {
      root.select("style").foreach(_.remove())
      root.select("link[rel=\"stylesheet\"]").foreach(_.remove())
    }
    if (removeComments) {
      def strip(e: Element): Unit = {
        e.children.collect { case c: CommentNode => c }.toList.foreach(_.remove())
        e.childElements.foreach(strip)
      }
      strip(root)
    }
  }

  /** extractor.ts:43-45 */
  def isMediaNode(e: Element): Boolean =
    Set("img", "video", "iframe", "embed").contains(e.tag)

  /** extractor.ts:47-52 */
  def hasVisibleContent(e: Element): Boolean =
    e.text.trim.nonEmpty || e.select("img, video, iframe, embed").nonEmpty

  /** extractor.ts:54-70: at least one link with a non-anchor,
    * non-javascript href AND non-empty text. */
  def hasValidLinks(e: Element): Boolean =
    e.select("a").exists { a =>
      val href = a.attr("href").getOrElse("")
      val text = a.text.trim
      href.nonEmpty && text.nonEmpty &&
        !href.startsWith("#") && !href.startsWith("javascript:")
    }

  private val PositivePatterns = Seq(
    "(?i)article|post|content|text", "(?i)main|body", "(?i)entry|blog").map(_.r)

  /** Alternate scorer (extractor.ts:72-111): only ReadabilityPlus uses
    * it; the live engine scores with BaseExtractor.calculateNodeScore. */
  def scoreElement(e: Element): Int = {
    var score = Map("article" -> 30, "main" -> 25, "section" -> 20, "div" -> 5)
      .getOrElse(e.tag, 0)
    val classAndId = e.attr("class").getOrElse("") + " " + e.id.getOrElse("")
    PositivePatterns.foreach(p => if (p.findFirstIn(classAndId).isDefined) score += 25)
    score += math.min(e.text.trim.length / 100, 50)
    score += e.select("p").length * 5
    score += e.select("img").length * 5
    score
  }

  /** extractor.ts:113-132: collapse whitespace in DIRECT child text
    * nodes, then merge adjacent direct text-node siblings.
    *
    * DELIBERATE DEVIATION (this is non-parity dead code, so the fix
    * is documented rather than replicated): the reference iterates a
    * pairwise SNAPSHOT of `contents()` while mutating it, so a run of
    * 3+ adjacent text nodes merges into an already-detached node and
    * the trailing text can be dropped ("a b c" → "a b"). This rebuild
    * merges the full run in place ("a b c"). */
  def normalizeText(e: Element): Unit = {
    e.children.foreach {
      case t: TextNode => t.data = t.data.replaceAll("\\s+", " ").trim
      case _           => ()
    }
    var i = 0
    while (i < e.children.length - 1) {
      (e.children(i), e.children(i + 1)) match {
        case (a: TextNode, b: TextNode) =>
          a.data = s"${a.data} ${b.data}".trim
          b.remove()
        case _ => i += 1
      }
    }
  }

  /** extractor.ts:134-171: lazy-img promote, external-link hardening,
    * first-row td→th. */
  def normalizeMedia(e: Element): Unit = {
    e.select("img").foreach { img =>
      (img.attr("src"), img.attr("data-src")) match {
        case (None, Some(ds)) => img.setAttr("src", ds)
        case _                => ()
      }
    }
    e.select("a").foreach { a =>
      if (a.attr("href").exists(_.startsWith("http"))) {
        a.setAttr("target", "_blank")
        a.setAttr("rel", "noopener noreferrer")
      }
    }
    e.select("table").foreach { table =>
      table.select("tr").headOption.foreach { firstRow =>
        firstRow.select("td").foreach { cell =>
          val th = new Element("th")
          cell.children.toList.foreach(th.appendChild)
          if (cell.parent != null) cell.parent.replaceChild(cell, th)
        }
      }
    }
  }
}

/** The reference's complete-but-never-imported alternate pipeline
  * (readability_plus.ts:14-114): cleanHtml → candidate scan over
  * article/main/section/div → scoreElement argmax → normalize.
  * Reference quirk kept: a candidate MUST contain at least one valid
  * link (hasValidLinks) — linkless pages yield None. */
final class ReadabilityPlus(
    minTextLength: Int = 25,
    minScore: Int = 20,
    removeScripts: Boolean = true,
    removeStyles: Boolean = true,
    removeComments: Boolean = true) {

  def parse(root: Element): Option[Element] = {
    Extras.cleanHtml(root, removeScripts, removeStyles, removeComments)
    val candidates = root.select("article, main, section, div").filter(isValid)
    val best = candidates.foldLeft(Option.empty[(Element, Int)]) { (acc, c) =>
      val s = Extras.scoreElement(c)
      acc match {
        case Some((_, bs)) if bs >= s => acc // first-wins on ties, like the ref loop
        case _                        => Some((c, s))
      }
    }.map(_._1)
    best.foreach { b => Extras.normalizeText(b); Extras.normalizeMedia(b) }
    best
  }

  private def isValid(e: Element): Boolean =
    e.text.trim.length >= minTextLength &&
      Extras.hasVisibleContent(e) &&
      Extras.hasValidLinks(e) &&
      Extras.scoreElement(e) >= minScore
}
