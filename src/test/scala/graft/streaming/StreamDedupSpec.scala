package graft.streaming

import graft.SparkTestBase
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming dedup invariants: the stream emits exactly what the batch
  * operators compute over the same corpus.
  */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docText(i: Int): String =
    s"the quick brown fox ${('a' + i % 7).toChar} jumps over the lazy dog number $i end of document"

  test("exactDedup emits one doc per digest across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamDedup.exactDedup(stream)
      .writeStream.format("memory").queryName("sd_exact").outputMode("append").start()
    val t0 = new Timestamp(1700000000000L)
    // batch 1: 3 uniques, one in-batch dup
    mem.addData((0L, "alpha beta", t0), (1L, "gamma delta", t0), (2L, "alpha beta", t0))
    q.processAllAvailable()
    // batch 2: cross-batch dup + one new
    mem.addData((3L, "gamma delta", t0), (4L, "epsilon zeta", t0))
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("sd_exact").select("text").as[String].collect().sorted
    assert(texts.toSeq == Seq("alpha beta", "epsilon zeta", "gamma delta"))
  }

  test("text-analysis operators run unchanged on a stream (quality filter)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    // quality() is a pure narrow projection, so it applies to streams as-is
    val q = graft.ops.TextAnalysis.quality(stream)
      .filter(org.apache.spark.sql.functions.col("n_words") >= 5)
      .writeStream.format("memory").queryName("sd_quality").outputMode("append").start()
    mem.addData((0L, "too short"), (1L, "this document has enough words to pass the filter"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sd_quality").select("doc_id").as[Long].collect()
    assert(rows.toSeq == Seq(1L))
  }

  test("cleaning chain (gopherKeep + redactPii) runs unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    // both ops are stateless narrow maps, so the whole pretraining cleaning
    // chain composes with readStream/writeStream as-is
    val q = graft.ops.TextAnalysis.redactPii(
        graft.ops.TextAnalysis.gopherKeep(stream))
      .writeStream.format("memory").queryName("sd_clean").outputMode("append").start()
    mem.addData(
      (0L, (1 to 30).map(i => s"word$i").mkString(" ") + " mail me at a.b@c.io"),
      (1L, "spam spam spam spam spam spam spam spam"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sd_clean").select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(0L))
    assert(out(0L).endsWith("mail me at <PII>"))
  }

  test("nearDupCandidates with tsCol ages out idle bucket state past the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamDedup.nearDupCandidates(stream, numPerm = 16, bands = 8,
      tsCol = Some("ts"), horizonMs = 10000L)
      .toDF("a", "b")
      .writeStream.format("memory").queryName("sd_expire").outputMode("append").start()
    val t0 = 1700000000000L
    val text = docText(1)
    // batch 1: two copies within the horizon -> pair emitted
    mem.addData((0L, text, new Timestamp(t0)), (1L, text, new Timestamp(t0 + 1000)))
    q.processAllAvailable()
    // batch 2: unrelated far-future doc pushes the watermark past the
    // horizon; docs 0/1's idle bucket groups time out and drop their state
    mem.addData((2L, docText(5) + " unrelated filler words", new Timestamp(t0 + 100000)))
    q.processAllAvailable()
    // batch 3: a third copy AFTER expiry -> no pair against the forgotten docs
    mem.addData((3L, text, new Timestamp(t0 + 101000)))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("sd_expire").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "within-horizon dup must pair")
    assert(!pairs.exists(p => p._2 == 3L), s"expired buckets must not pair: $pairs")
  }

  test("first-batch bucket state survives a watermark advance WITHIN the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamDedup.nearDupCandidates(stream, numPerm = 16, bands = 8,
      tsCol = Some("ts"), horizonMs = 10000L)
      .toDF("a", "b")
      .writeStream.format("memory").queryName("sd_firstbatch").outputMode("append").start()
    val t0 = 1700000000000L
    val text = docText(2)
    // batch 1: one doc; the watermark is still epoch-0, so a timeout keyed
    // on watermark+horizon alone would be ~1970 and fire immediately
    mem.addData((0L, text, new Timestamp(t0)))
    q.processAllAvailable()
    // batch 2: unrelated doc 2s later advances the watermark to ~t0-8s —
    // far past a 1970 timeout, still inside doc 0's 10s horizon
    mem.addData((1L, docText(6) + " unrelated filler words", new Timestamp(t0 + 2000)))
    q.processAllAvailable()
    // batch 3: a duplicate 3s after doc 0 (well inside the horizon) MUST
    // still pair — the event-time-anchored timeout keeps the state alive
    mem.addData((2L, text, new Timestamp(t0 + 3000)))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("sd_firstbatch").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)),
      s"first-batch state was evicted inside the horizon: $pairs")
  }

  test("nearDupCandidates == batch lshCandidatePairs over the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus with real near-dups: pairs of docs differing by one word
    val docs = (0 until 30).map { i =>
      val base = docText(i / 2)
      (i.toLong, if (i % 2 == 0) base else base + " tweaked")
    }
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamDedup.nearDupCandidates(stream, numPerm = 16, bands = 8)
      .toDF("a", "b")
      .writeStream.format("memory").queryName("sd_near").outputMode("append").start()
    // split across micro-batches so pairs span batch boundaries
    mem.addData(docs.take(11): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(11): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sd_near").as[(Long, Long)].collect().toSet

    val batchDf = docs.toDF("doc_id", "text")
    val batch = Dedup.lshCandidatePairs(
      Dedup.lshBands(Dedup.minhashSignatures(batchDf, numPerm = 16), bands = 8))
      .as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "corpus should produce LSH candidates")
    assert(streamed == batch)
  }
}
