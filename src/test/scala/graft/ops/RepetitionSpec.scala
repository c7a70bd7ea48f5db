package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher-style repetition signals, n-gram benchmark decontamination, and
  * chunk-level corpus dedup stats — hand-computed expectations.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def repRow(text: String): (Long, Long, Long, Long, Long, Long) = {
    val r = TextAnalysis.repetition(Seq((0L, text)).toDF("doc_id", "text"))
      .collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
  }

  test("repetition: alternating pair doc") {
    // "a b a b a": 5 words, 2 distinct; top bigram ("a b") x2; one 5-gram
    assert(repRow("a b a b a") == ((5L, 600L, 2L, 800L, 0L, 0L)))
  }

  test("repetition: fully periodic doc has total 5-gram duplication") {
    // 12 words, period 3: every 5-gram position repeats -> dup5 = 8 of 8
    assert(repRow("x y z x y z x y z x y z") == ((12L, 750L, 4L, 666L, 8L, 1000L)))
  }

  test("repetition: all-distinct doc scores zero duplication") {
    assert(repRow("unique words only here now") == ((5L, 0L, 1L, 400L, 0L, 0L)))
  }

  test("repetition: below the 5-gram window the fraction is zero") {
    assert(repRow("a b c") == ((3L, 0L, 1L, 666L, 0L, 0L)))
  }

  test("gopherKeep drops high-repetition docs, keeps clean ones, preserves columns") {
    val docs = Seq(
      (0L, (1 to 30).map(i => s"distinct$i").mkString(" "), "s"),
      (1L, "spam spam spam spam spam spam spam spam", "s")
    ).toDF("doc_id", "text", "source")
    val kept = TextAnalysis.gopherKeep(docs)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(0L))
  }

  test("contamination flags shared 4-grams and exact short docs; decontaminate is the complement") {
    val corpus = Seq(
      (10L, "one two three four five six"),   // shares "two three four five"
      (11L, "totally different text content here"),
      (12L, "tiny doc")                        // < k words: whole-text shingle
    ).toDF("doc_id", "text")
    val bench = Seq(
      (0L, "zz two three four five yy"),
      (1L, "tiny doc")
    ).toDF("doc_id", "text")
    val hits = Dedup.contaminationHits(corpus, bench, k = 4)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(10L -> 1L, 12L -> 1L))
    val clean = Dedup.decontaminate(corpus, bench, k = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(clean == Seq(11L))
  }

  test("chunks: non-overlapping windows, last partial kept") {
    val words = (1 to 23).map(i => s"w$i").mkString(" ")
    val ch = Dedup.chunks(Seq((0L, words)).toDF("doc_id", "text"))
      .orderBy("chunk_idx").as[(Long, Int, String)].collect()
    assert(ch.length == 3)
    assert(ch(0)._3 == (1 to 10).map(i => s"w$i").mkString(" "))
    assert(ch(2)._3 == (21 to 23).map(i => s"w$i").mkString(" "))
  }

  test("repetition kernel ≡ expression spec on a real corpus + edge cases") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq(
        (100000L, ""), (100001L, "one"), (100002L, "a a a a a a"),
        (100003L, "x  y"), (100004L, "tail space "),
        (100005L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val k = TextAnalysis.withRepetition(docs)
      .select("doc_id", "n_words", "dup_word_frac_q3", "top2_cnt",
        "top2_frac_q3", "dup5_cnt", "dup5_frac_q3")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val e = TextAnalysis.withRepetitionExpr(docs)
      .select("doc_id", "n_words", "dup_word_frac_q3", "top2_cnt",
        "top2_frac_q3", "dup5_cnt", "dup5_frac_q3")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(k == e)
  }

  test("hashSplit is deterministic, well-proportioned, and column-preserving") {
    val docs = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = TextAnalysis.hashSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = TextAnalysis.hashSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
    val train = a.values.count(_ == "train")
    assert(train > 850 && train < 950) // md5 buckets ~ uniform at n=1000
    // a different seed reshuffles membership
    val c = TextAnalysis.hashSplit(docs, seed = "7").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a != c)
  }

  test("unigramSurprisal: rare-token docs score higher; integer-exact mean") {
    // corpus: "a" x 6, "b" x 2, "rare" x 1, total 9
    val docs = Seq((0L, "a a a"), (1L, "a a a b b"), (2L, "rare")).toDF("doc_id", "text")
    val s = TextAnalysis.unigramSurprisal(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    def q(p: Double): Long = math.floor(-math.log(p) * 1000).toLong
    assert(s(0) == ((0L, 3L, q(6.0 / 9))))
    assert(s(1) == ((1L, 5L, (3 * q(6.0 / 9) + 2 * q(2.0 / 9)) / 5)))
    assert(s(2) == ((2L, 1L, q(1.0 / 9))))
    assert(s(2)._3 > s(1)._3 && s(1)._3 > s(0)._3)
  }

  test("sampleByHash: deterministic per-group rates, independent of the split hash") {
    val docs = (0L until 1000L)
      .map(i => (i, if (i < 500) "a" else "b")).toDF("doc_id", "source")
    val kept = TextAnalysis.sampleByHash(docs, Map("a" -> 200))
      .select("doc_id", "source").as[(Long, String)].collect()
    val (ka, kb) = (kept.count(_._2 == "a"), kept.count(_._2 == "b"))
    assert(kb == 500)            // default rate keeps everything
    assert(ka > 60 && ka < 140)  // ~20% of 500, md5-uniform
    // deterministic
    val again = TextAnalysis.sampleByHash(docs, Map("a" -> 200))
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    // a 50% sample and a 50% split use different seeds -> near-independent
    val half = TextAnalysis.sampleByHash(docs, Map("a" -> 500, "b" -> 500))
      .select("doc_id").as[Long].collect().toSet
    val train = TextAnalysis.hashSplit(docs, trainPerMille = 500)
      .filter(col("split") === "train").select("doc_id").as[Long].collect().toSet
    val overlap = (half & train).size.toDouble / 1000.0
    assert(overlap > 0.15 && overlap < 0.35) // ~25% under independence
  }

  test("vocab counts tokens corpus-wide and truncates at minCount") {
    val docs = Seq((0L, "a b a c"), (1L, "a b b")).toDF("doc_id", "text")
    val v = TextAnalysis.vocab(docs, minCount = 2L)
      .as[(String, Long)].collect().toMap
    assert(v == Map("a" -> 3L, "b" -> 3L))
  }

  test("piiStats counts and redactPii replaces emails, IPs, phones") {
    val docs = Seq(
      (0L, "contact me at bob.smith@corp.io or 192.168.0.1 or 555-123-4567 ok"),
      (1L, "no pii here at all")
    ).toDF("doc_id", "text")
    val st = TextAnalysis.piiStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(st(0) == ((0L, 1L, 1L, 1L)))
    assert(st(1) == ((1L, 0L, 0L, 0L)))
    val red = TextAnalysis.redactPii(docs).orderBy("doc_id")
      .select("text").as[String].collect()
    assert(red(0) == "contact me at <PII> or <PII> or <PII> ok")
    assert(red(1) == "no pii here at all")
  }

  test("chunkDupStats counts corpus-wide duplicate chunks per doc") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (0L, boiler + " " + (1 to 7).map(i => s"x$i").mkString(" ")),
      (1L, boiler + " " + (1 to 7).map(i => s"y$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val st = Dedup.chunkDupStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    // docs 0/1: 2 chunks each, the shared boilerplate chunk is duplicated
    assert(st(0) == ((0L, 2L, 1L, 500L)))
    assert(st(1) == ((1L, 2L, 1L, 500L)))
    assert(st(2) == ((2L, 2L, 0L, 0L)))
  }
}
