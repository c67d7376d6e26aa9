package graft.extract

/** Golden-fixture inputs (FIXTURES.md §A): each named HTML document
  * targets specific reference behaviors. Expected outputs are frozen
  * under src/test/resources/fixtures/<name>.json by
  * graft.tools.FreezeFixtures once reviewed; GoldenFixtureSpec then
  * pins the engine to them — the fixtures, not the reference's
  * accidents, are the parity contract (SURVEY.md §5.2).
  */
object FixtureCorpus {

  private val longPara =
    "Broadcast joins avoid shuffling the large fact table and ship the small dimension to every executor. " +
    "Sort-merge joins shuffle both sides by the join key and stay robust at scale. " +
    "Adaptive execution re-plans at runtime using observed statistics!"

  val fixtures: Seq[(String, String, String)] = Seq(
    ("article-basic",
     "https://example.com/post/1",
     s"""<html><head><title>Spark Joins Explained | ExampleSite</title>
        |<meta property="og:title" content="Spark Joins Explained"/>
        |<meta name="author" content="jordan-writer"/></head>
        |<body><nav class="navbar"><a href="/">home</a><a href="/a">about</a></nav>
        |<article class="article-content"><h1>Spark Joins Explained</h1>
        |<p>$longPara</p><p>Second paragraph. With punctuation!</p></article>
        |<footer class="footer">copyright example</footer></body></html>""".stripMargin),

    ("article-custom-selector",
     "https://example.com/blog/2",
     s"""<html><head><title>Entry Content Wins</title></head>
        |<body><div class="entry-content content"><h2>Entry Content Wins</h2>
        |<p>$longPara</p><p>$longPara</p></div>
        |<div class="sidebar">short links <a href="#">x</a></div></body></html>""".stripMargin),

    ("article-heuristic",
     "https://example.com/no-selectors",
     s"""<html><head><title>Heuristic Pick</title></head>
        |<body><div id="wrapper"><div id="left">menu menu menu <a href="/">l</a><a href="/">l</a></div>
        |<div id="mainbox"><h2>Heuristic Pick</h2><p>$longPara</p>
        |<p>$longPara</p><p>More sentences here. Even more!</p></div>
        |<div id="right">ads ads ads</div></div></body></html>""".stripMargin),

    ("article-body-fallback",
     "https://example.com/plain",
     "<html><body>" +
       ("plain unstructured body text without any containers that would score, repeated to pass length limits. " * 3)
       + "</body></html>"),

    ("noise-removal",
     "https://example.com/noisy",
     s"""<html><head><title>Noise Removal</title></head>
        |<body><nav class="nav"><a href="/">1</a><a href="/">2</a></nav>
        |<div class="sidebar">related <a href="#">a</a> <a href="#">b</a></div>
        |<div class="social">share buttons</div>
        |<div class="ads">buy things</div>
        |<div style="display: none">hidden text</div>
        |<div hidden>also hidden</div>
        |<article class="article-content"><h1>Noise Removal</h1><p>$longPara</p>
        |<div class="comment">a comment that is fairly long and should still be stripped as noise from the page content here</div>
        |</article></body></html>""".stripMargin),

    ("link-density-reject",
     "https://example.com/linky",
     s"""<html><head><title>Link Density</title></head>
        |<body><div class="entry-content"><a href="/x">${"link text " * 30}</a><p>tiny</p></div>
        |<div class="post-content content"><h2>Link Density</h2><p>$longPara</p><p>$longPara</p></div></body></html>""".stripMargin),

    ("title-similarity",
     "https://example.com/titles",
     s"""<html><head><title>Tuning Shuffle Partitions for Spark</title></head>
        |<body><article class="article-content"><h3>Completely Different Heading</h3>
        |<h1>Tuning Shuffle Partitions</h1><h2>Unrelated Sidebar Title</h2>
        |<p>$longPara</p></article></body></html>""".stripMargin),

    ("title-clean",
     "https://example.com/title-clean",
     s"""<html><head><title>Deep  Dive [draft] into AQE | My Site Name</title></head>
        |<body><article class="article-content"><p>$longPara</p></article></body></html>""".stripMargin),

    ("tables-code",
     "https://example.com/table-code",
     s"""<html><head><title>Tables And Code</title></head>
        |<body><article class="article-content"><h1>Tables And Code</h1><p>$longPara</p>
        |<table><tr><td>header one</td><td>header two</td></tr>
        |<tr><td>cell a</td><td>cell b</td></tr></table>
        |<pre class="language-scala">val x = spark.read.parquet(path)</pre>
        |<code>df.groupBy(col)</code></article></body></html>""".stripMargin),

    ("math",
     "https://example.com/math",
     s"""<html><head><title>Math Doc</title></head>
        |<body><article class="article-content"><p>$longPara</p>
        |<p>Inline $$a+b$$ then display $$$$E=mc^2$$$$ end.</p>
        |<span class="math-inline">x^2</span>
        |<div class="math-display">\\sum_i x_i</div>
        |<p>\\begin{equation}y=mx\\end{equation}</p></article></body></html>""".stripMargin),

    ("quotes-notes",
     "https://example.com/quotes",
     s"""<html><head><title>Quotes Doc</title></head>
        |<body><article class="article-content"><p>$longPara</p>
        |<blockquote>quoted wisdom<cite>the source</cite></blockquote>
        |<div class="footnote">a footnote with a <a href="#ref1">back link</a> and enough text to survive cleaning stages</div>
        |<div class="sidenote">a margin remark that is long enough to stay in the document after cleaning</div>
        |</article></body></html>""".stripMargin),

    ("heading-continuity",
     "https://example.com/headings",
     s"""<html><head><title>Heading Levels</title></head>
        |<body><article class="article-content"><h1>Heading Levels</h1>
        |<h4>Jumped Too Deep</h4><p>$longPara</p>
        |<p> </p><p>Tail paragraph. Done!</p></article></body></html>""".stripMargin),

    ("forum-thread",
     "conv://forum-conv/0",
     s"""<html><head><title>Big question - Forum</title></head>
        |<body><div class="thread"><div class="post first-post"><div class="post-content">
        |<h2>Big question</h2><p>$longPara</p></div></div>
        |<div class="post reply"><div class="reply-content"><p>First reply agrees with everything stated above. Quite convincing!</p></div></div>
        |<div class="post reply"><div class="reply-content"><p>Second reply adds caveats about memory pressure and spill behavior.</p></div></div>
        |<span class="view-count">1234 views</span></div></body></html>""".stripMargin),

    ("weixin",
     "https://mp.weixin.qq.com/s/abc123",
     s"""<html><head><title>WX Article</title></head>
        |<body><div class="rich_media"><h1 class="rich_media_title">WX Article</h1>
        |<span id="js_name">some-official-account</span>
        |<em id="publish_time">2024-01-02</em>
        |<div id="js_content" class="rich_media_content"><p>$longPara</p>
        |<p>Closing paragraph. Done!</p></div>
        |<span id="js_read_count">4521</span>
        |<div class="rich_media_tool">toolbar</div></div></body></html>""".stripMargin),

    ("whitespace-precollapse",
     "https://example.com/pre",
     s"""<html><head><title>Pre Newlines</title></head>
        |<body><article class="article-content"><p>$longPara</p>
        |<pre>line1
        |line2
        |  indented</pre></article></body></html>""".stripMargin),

    ("script-survival",
     "https://example.com/script",
     s"""<html><head><title>Script Survival</title></head>
        |<body><article class="article-content"><p>$longPara</p>
        |<script>var tracker = "should survive into textContent";</script>
        |</article></body></html>""".stripMargin),

    ("markdown-rules",
     "https://example.com/md",
     s"""<html><head><title>Markdown Rules</title></head>
        |<body><article class="article-content"><h1>Markdown Rules</h1>
        |<p>$longPara</p>
        |<p>Some <em>emphasis</em> and <strong>bold</strong> and <del>gone</del> text with a <a href="https://spark.apache.org">link</a>.</p>
        |<ul><li>first item</li><li>second item</li></ul>
        |<ol><li>one</li><li>two</li></ol>
        |<hr>
        |<table><tr><th>kept</th></tr><tr><td>as html</td></tr></table>
        |</article></body></html>""".stripMargin),

    ("malformed-html",
     "conv://broken/0",
     "<html><body><div class=\"entry-content\"><p>" + longPara +
       "<div><span>unclosed everywhere <b>bold<i>italic</b>" + longPara))

  /** Inputs that must produce quarantine errors. */
  val errorFixtures: Seq[(String, String, String)] = Seq(
    ("short-input-reject", "https://example.com/short", "<p>too short</p>"))
}
