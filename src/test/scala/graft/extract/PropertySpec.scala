package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized property tests (SURVEY.md §5.2(3)): totality on
  * arbitrary-ish HTML, determinism, serialize/parse fixpoint, Dice
  * bounds/symmetry. Seeded — fully reproducible.
  */
class PropertySpec extends AnyFunSuite {

  private val tagPool = Vector("div", "p", "span", "article", "b", "ul",
    "li", "table", "tr", "td", "h1", "script", "pre", "img", "br", "a")
  private val words = Vector("alpha", "beta", "gamma<", ">delta", "&amp;",
    "&bogus;", "text with spaces", "\"quoted\"", "$x$", "5 < 6", "<!--", "-->")
  private val attrs = Vector("", " class=\"post\"", " class=\"x y\"",
    " id=\"k\"", " style=\"display: none\"", " href=\"#\"")

  private def genNode(rnd: Random, depth: Int): String =
    if (depth <= 0 || rnd.nextInt(5) < 2) words(rnd.nextInt(words.length))
    else {
      val t = tagPool(rnd.nextInt(tagPool.length))
      val a = attrs(rnd.nextInt(attrs.length))
      val kids = (1 to 3).map(_ => genNode(rnd, depth - 1)).mkString
      val closed = rnd.nextInt(3) != 0
      s"<$t$a>$kids" + (if (closed) s"</$t>" else "")
    }

  private def genHtml(rnd: Random): String =
    "<html><body>" + (1 to 6).map(_ => genNode(rnd, 3)).mkString + "</body></html>"

  private val N = 300

  test("extraction is total and deterministic on arbitrary HTML") {
    val rnd = new Random(42)
    val set = new ExtractorSet
    (1 to N).foreach { i =>
      val html = genHtml(rnd)
      val a = set.extract(html, "conv://p/0") // must not throw
      val b = set.extract(html, "conv://p/0")
      assert(a == b, s"non-deterministic at case $i")
    }
  }

  test("parser is total; serialization reaches a re-parse fixpoint") {
    val rnd = new Random(7)
    (1 to N).foreach { i =>
      val html = genHtml(rnd)
      val once = HtmlParser.parse(html).outerHtml
      val twice = HtmlParser.parse(once).outerHtml
      assert(HtmlParser.parse(twice).outerHtml == twice, s"no fixpoint at case $i")
    }
  }

  test("dice similarity: reference semantics (asymmetric with duplicates)") {
    // The reference's calculateSimilarity (similarity.ts:4-20) counts
    // words of w1 found ANYWHERE in w2 — with duplicate words it is
    // neither symmetric nor bounded by 1. Pin that behavior:
    assert(TitleExtract.dice("a a", "a") == 4.0 / 3.0)
    assert(TitleExtract.dice("a", "a a") == 2.0 / 3.0)
    // …but for duplicate-free token lists it IS a Dice coefficient:
    val rnd = new Random(11)
    val vocab = Vector("a", "bb", "word", "zz", "qq", "north")
    (1 to 500).foreach { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(vocab.length)).mkString(" ")
      val b = rnd.shuffle(vocab).take(rnd.nextInt(vocab.length)).mkString(" ")
      val d1 = TitleExtract.dice(a, b)
      val d2 = TitleExtract.dice(b, a)
      assert(d1 >= 0.0 && d1 <= 1.0)
      assert(math.abs(d1 - d2) < 1e-12)
    }
  }
}
