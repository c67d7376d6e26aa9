package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the round-6 pipeline operators: q41 incremental
  * ingest dedup (store anti-join + in-batch dedup + cross near-dup),
  * q42 PII scrubbing (stage order, counts, idempotence), q43
  * benchmark-contamination (overlap ratio semantics). The full-value
  * oracle parity of all three is covered by the driver's DuckDB gate;
  * these tests pin the SEMANTICS on adversarial synthetic rows the
  * corpus doesn't contain. */
class IngestPiiSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---------------- q42 piiScrub ----------------

  private def scrub(rows: (Long, String)*): Map[Long, (Long, Long, Long, String)] =
    TextPipeline.piiScrub(docs(rows: _*)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap

  test("piiScrub redacts emails with subdomains, plus-tags and multi-part TLDs") {
    val out = scrub(1L -> "Reach a.b-c_d%x@ex-ample.co.uk or x+tag@y.io today")
    assert(out(1L) == ((0L, 2L, 0L, "Reach <EMAIL> or <EMAIL> today")))
  }

  test("piiScrub consumes an email-like query string inside a URL (stage order)") {
    val out = scrub(2L -> "see https://h.example/a?e=a@b.com now")
    assert(out(2L) == ((1L, 0L, 0L, "see <URL> now")))
  }

  test("piiScrub redacts phone-like digit runs but not short ones") {
    val out = scrub(
      3L -> "call +1-555-867-5309 or 0123456789 now",
      4L -> "sections 12-34 and 1-2-3 stay")
    assert(out(3L) == ((0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(out(4L) == ((0L, 0L, 0L, "sections 12-34 and 1-2-3 stay")))
  }

  test("piiScrub is idempotent — scrubbed text has nothing left to redact") {
    val once = scrub(5L -> "mail a@b.co via https://x.y or +1-555-0100-0")(5L)
    val twice = scrub(6L -> once._4)(6L)
    assert(twice == ((0L, 0L, 0L, once._4)))
  }

  test("piiScrub leaves PII-free text byte-identical with zero counts") {
    val plain = "the quick brown fox jumps over the lazy dog"
    assert(scrub(7L -> plain)(7L) == ((0L, 0L, 0L, plain)))
  }

  // ---------------- q41 incrementalIngest ----------------

  test("incrementalIngest drops exact dups vs store, in-batch dups, and cross near-dups") {
    val store = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six")
    val batch = docs(
      10L -> "alpha beta gamma delta epsilon", // exact dup of store 1 → dropped
      11L -> "completely fresh words here now", // admitted
      12L -> "completely fresh words here now", // in-batch exact dup of 11 → dropped
      13L -> "alpha beta gamma delta zeta", // Jaccard 2/4 = 0.5 vs store 1 → dropped
      14L -> "p q r s t", // admitted (near-dup pair winner: lower id)
      15L -> "p q r s u") // Jaccard 2/4 = 0.5 vs batch 14 → dropped
    try {
      val got = TextPipeline.incrementalIngest(store, batch)
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(11L, 14L))
    } finally TempCaches.release(spark)
  }

  test("q41 on the test corpus: re-ingested store content never re-admits") {
    try {
      val got = graft.SparkEntry.queries("q41_ingest_dedup")(spark, "/root/testdata/sf0.001")
        .collect().map(_.getLong(0)).toSeq
      // every admitted id is a genuine batch id (slice %10 ∈ {8,9});
      // all +1e6 re-keyed re-ingests are exact dups of the store and
      // must be dropped by the hash anti-join
      assert(got.nonEmpty)
      assert(got.forall(id => id < 1000000L && id % 10 >= 8), got.take(5))
    } finally TempCaches.release(spark)
  }

  // ---------------- q43 contamination ----------------

  test("contamination flags an eval-identical doc at 1.0 and a fresh doc at 0.0") {
    val evalSet = docs(100L -> "secret eval question tokens here")
    val corpus = docs(
      1L -> "secret eval question tokens here", // identical → overlap 1.0
      2L -> "totally unrelated words only now", // 0.0
      3L -> "secret eval question fresh stuff", // partial: shingles {s e q, e q f, q f s}; hit {s e q} = 1/3
      4L -> "too short") // < 3 tokens → absent
    try {
      val got = TextPipeline.contamination(corpus, evalSet).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        .toMap
      assert(got.keySet == Set(1L, 2L, 3L))
      assert(got(1L) == ((3L, 3L, 1.0, true)))
      assert(got(2L) == ((3L, 0L, 0.0, false)))
      assert(got(3L)._2 == 1L && !got(3L)._4)
    } finally TempCaches.release(spark)
  }

  test("contamination boundary: overlap exactly 0.5 is contaminated (>=)") {
    val evalSet = docs(100L -> "a b c d")
    // corpus shingles: {a b c, b c d, c d x, d x y} → hits {a b c, b c d} = 2/4
    val corpus = docs(1L -> "a b c d x y")
    try {
      val got = TextPipeline.contamination(corpus, evalSet).collect().head
      assert(got.getLong(1) == 4L && got.getLong(2) == 2L)
      assert(got.getDouble(3) == 0.5 && got.getBoolean(4))
    } finally TempCaches.release(spark)
  }
}
