package graft.tools

import graft.extract._

/** Single-threaded microbenchmark of the pure extraction engine
  * (no Spark): per-stage timings to guide optimization.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val body = "spark group query row data slow small filter customer line the batch " * 8
    val html =
      s"""<html><head><title>Doc transcript turn | ExampleSite</title>
         |<meta property="og:title" content="Doc transcript turn"/>
         |<meta name="author" content="gen-author-1"/></head>
         |<body><nav class="navbar"><a href="/">home</a><a href="/about">about</a><a href="/contact">contact</a></nav>
         |<div class="sidebar">related links and more links <a href="#">one</a> <a href="#">two</a> <a href="#">three</a></div>
         |<article class="article-content"><h1>Doc transcript turn</h1>
         |<p>$body</p>
         |<p>Second paragraph with punctuation. It has sentences! Does it help scoring? Yes.</p>
         |</article>
         |<footer class="footer">copyright example</footer></body></html>""".stripMargin

    val set = new ExtractorSet
    def bench(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"$label%-22s ${ms / n}%8.3f ms/doc  (${n / (ms / 1000)}%8.0f docs/sec)")
    }

    // warm-up
    (1 to 200).foreach(_ => set.extract(html, "conv://c/0"))

    bench("parse only") { HtmlParser.parse(set.article.preCollapse(html)) }
    val doc0 = HtmlParser.parse(set.article.preCollapse(html))
    bench("detect") { set.detectPageType("conv://c/0", doc0) }
    bench("full extract") { set.extract(html, "conv://c/0") }
    val r = set.extract(html, "conv://c/0").toOption.get
    bench("markdown render") { MarkdownRenderer.render(r.content) }
    bench("text render") { TextRenderer.render(r.content) }
  }
}
