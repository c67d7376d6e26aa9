package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-6 mixing/keyword/repetition operators:
  * q44 deterministic quota sampling, q45 rational TF-IDF top-k, q46
  * within-doc repetition filter. Full value parity is covered by the
  * driver's DuckDB gate; these pin the semantics on constructed rows
  * (exact tf/df arithmetic, repetition counting, unknown-language
  * default, determinism). */
class MixRepetitionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---------------- q44 mixSample ----------------

  test("mixSample is deterministic and an unknown language takes the default weight") {
    val s = spark; import s.implicits._
    val docs = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "en" else "xx", s"src${i % 3}")).toDF("doc_id", "lang", "source")
    val a = TextPipeline.mixSample(spark, docs).collect()
    val b = TextPipeline.mixSample(spark, docs).collect()
    assert(a.toSeq == b.toSeq) // content-independent key hash => idempotent resume
    val byLang = a.groupBy(_.getString(0))
    // totals survive the accounting agg
    assert(byLang("en").map(_.getLong(2)).sum == 200L)
    assert(byLang("xx").map(_.getLong(2)).sum == 200L)
    // the unknown lang is sampled (default 5000/10000), not dropped or all-admitted
    val xxAdm = byLang("xx").map(_.getLong(3)).sum
    assert(xxAdm > 0L && xxAdm < 200L, s"xx admitted $xxAdm of 200")
    // admit_ratio is the exact int/int division
    a.foreach(r => assert(r.getDouble(4) == r.getLong(3).toDouble / r.getLong(2).toDouble))
  }

  // ---------------- q45 tfidfTopK ----------------

  test("tfidfTopK computes exact rational tf-idf with deterministic tiebreak") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry")).toDF("doc_id", "text")
    val got = TextPipeline.tfidfTopK(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    // n_docs=2; df: apple 1, banana 2, cherry 1
    // doc1: apple 2*2/1=4.0, banana 1*2/2=1.0; doc2: cherry 2.0, banana 1.0
    assert(got.toSeq == Seq(
      (1L, 1L, "apple", 2L, 1L, 4.0),
      (1L, 2L, "banana", 1L, 2L, 1.0),
      (2L, 1L, "cherry", 1L, 1L, 2.0),
      (2L, 2L, "banana", 1L, 2L, 1.0)))
  }

  test("tfidfTopK ties break on term ascending") {
    val s = spark; import s.implicits._
    // both terms: tf=1, df=2 => equal scores in both docs
    val docs = Seq((1L, "beta alpha"), (2L, "alpha beta")).toDF("doc_id", "text")
    val got = TextPipeline.tfidfTopK(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, "alpha"), (1L, 2L, "beta"),
      (2L, 1L, "alpha"), (2L, 2L, "beta")))
  }

  // ---------------- q46 repetition ----------------

  test("repetition counts duplicate and most-common shingle fractions exactly") {
    val s = spark; import s.implicits._
    // "a b a b a b a": 7 tokens -> 5 shingles: aba, bab, aba, bab, aba
    val docs = Seq((1L, "a b a b a b a"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextPipeline.repetition(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got(1L) == ((5L, 2L, 3L, 0.6, 0.6, true)))
    // 2 shingles, no repetition: top_frac 0.5 but under the n_sh >= 30
    // floor the top-frac rule must NOT fire
    assert(got(2L) == ((2L, 2L, 1L, 0.0, 0.5, false)))
  }

  // ---------------- q47 splitLeakage ----------------

  test("splitOf is deterministic with an ~80/10/10 distribution") {
    val s = spark; import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    val ids = (1L to 1000L).toDF("doc_id")
    val counts = ids.select(TextPipeline.splitOf(col("doc_id")).as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000L)
    assert(counts("train") > 750L && counts("train") < 850L, counts.toString)
    assert(counts("val") > 60L && counts("val") < 140L, counts.toString)
    assert(counts("test") > 60L && counts("test") < 140L, counts.toString)
  }

  test("q47 equals q18's near-dup pairs restricted to cross-split (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    try {
      val q18 = graft.SparkEntry.queries("q18_shingle_jaccard_capped")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.queries.TempCaches.release(spark)
      val q47 = graft.SparkEntry.queries("q47_split_leakage")(spark, d).collect()
      graft.queries.TempCaches.release(spark)
      val q47Pairs = q47.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(q47Pairs.subsetOf(q18)) // every leak is a near-dup pair
      q47.foreach(r => assert(r.getString(2) != r.getString(3))) // strictly cross-split
      // the dropped complement is exactly the same-split pairs
      val docs = Tables.documents(spark, d)
        .select(col("doc_id"), TextPipeline.splitOf(col("doc_id")).as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = q18.filter { case (a, b) => docs(a) != docs(b) }
      assert(q47Pairs == expected)
    } finally graft.queries.TempCaches.release(spark)
  }

  test("repetition omits docs with fewer than 3 tokens") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "too short"), (2L, "just three tokens")).toDF("doc_id", "text")
    val got = TextPipeline.repetition(docs).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
  }
}
