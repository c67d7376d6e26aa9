package graft.tools

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import graft.extract._

/** Pure-JVM thread-scaling probe of the extraction engine (no
  * Spark): fixed work per thread, varying thread counts — separates
  * engine-level scalability (allocation, shared state) from
  * Spark-level effects.
  */
object ThreadScaling {
  def main(args: Array[String]): Unit = {
    val perThread = args.headOption.map(_.toInt).getOrElse(2000)
    val body = "spark group query row data slow small filter customer line the batch " * 8
    val html =
      s"""<html><head><title>Doc | Site</title></head>
         |<body><nav class="navbar"><a href="/">home</a></nav>
         |<article class="article-content"><h1>Doc</h1><p>$body</p>
         |<p>Punctuated sentence. Another one!</p></article>
         |<footer class="footer">foot</footer></body></html>""".stripMargin

    // warm-up
    val w = new ExtractorSet
    (1 to 300).foreach(_ => w.extract(html, "conv://w/0"))

    for (threads <- Seq(1, 4, 8, 16, 32)) {
      val pool = Executors.newFixedThreadPool(threads)
      val done = new AtomicLong()
      val t0 = System.nanoTime()
      (1 to threads).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val set = new ExtractorSet
            var i = 0
            while (i < perThread) { set.extract(html, "conv://t/0"); i += 1 }
            done.addAndGet(perThread)
          }
        })
      }
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.MINUTES)
      val sec = (System.nanoTime() - t0) / 1e9
      val tput = done.get() / sec
      println(f"threads=$threads%2d  docs/sec=$tput%9.0f  per-core=${tput / threads}%8.0f")
    }
  }
}
