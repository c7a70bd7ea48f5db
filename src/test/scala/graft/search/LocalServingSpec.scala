package graft.search

import graft.SparkTestBase
import graft.index.{Deletes, IndexBuilder, IndexConfig, IndexReader}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-local serving: results must be bit-identical to the distributed
  * bm25TopK on every path (cold cache, warm cache, forced fallback,
  * tombstones), and the LRU must actually bound memory and count hits.
  */
class LocalServingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val dir: String = {
    import spark.implicits._
    val docs = (0L until 120L).map { i =>
      val extra = if (i % 11 == 0) " mango" else if (i % 7 == 0) " kiwi mango" else ""
      (i, s"alpha beta word$i gamma ${"alpha " * (i % 3).toInt}$extra")
    }
    val d = java.nio.file.Files.createTempDirectory("graft_ls_").toString
    IndexBuilder.build(spark, docs.toDF("docId", "content"), d,
      IndexConfig(tokenizerName = "TokenDelimit", nShards = 4,
        buildPartitions = 4, hotTermDf = 100000L, nSalts = 2))
    d
  }

  private def distributed(reader: IndexReader, q: String, k: Int): Seq[ScoredDoc] =
    Engine.bm25TopK(reader, q, k).collect().toSeq.sorted(Bm25Shard.resultOrdering)

  test("local results are bit-identical to the distributed path") {
    val reader = new IndexReader(spark, dir)
    val ls = new LocalServing(reader)
    for (q <- Seq("alpha", "mango", "kiwi mango", "alpha beta gamma", "word5 alpha")) {
      val loc = ls.bm25TopK(q, 10)
      val dist = distributed(reader, q, 10)
      assert(loc == dist, s"mismatch for <$q>")
    }
    assert(ls.fallbacks == 0)
  }

  test("repeated queries hit the cache (no refetch) with identical results") {
    val reader = new IndexReader(spark, dir)
    val ls = new LocalServing(reader)
    val first = ls.bm25TopK("alpha mango", 5)
    val missAfterFirst = ls.misses
    val second = ls.bm25TopK("alpha mango", 5)
    assert(first == second && first.nonEmpty)
    assert(ls.misses == missAfterFirst, "second query refetched postings")
    assert(ls.hits >= 2)
  }

  test("over-budget terms fall back to the distributed path, same results") {
    val reader = new IndexReader(spark, dir)
    val ls = new LocalServing(reader, maxCachedBytes = 1L) // nothing fits
    val loc = ls.bm25TopK("alpha beta", 10)
    assert(loc == distributed(reader, "alpha beta", 10) && loc.nonEmpty)
    assert(ls.fallbacks >= 1)
  }

  test("LRU evicts under the byte budget but never serves partial data") {
    val reader = new IndexReader(spark, dir)
    // tiny budget: each single-term fetch fits, multi-term sets thrash
    val ls = new LocalServing(reader, maxCachedBytes = 600L)
    for (q <- Seq("alpha", "beta", "gamma", "mango", "alpha", "gamma")) {
      assert(ls.bm25TopK(q, 10) == distributed(reader, q, 10), s"mismatch for <$q>")
    }
  }

  test("unknown terms and empty queries return empty") {
    val reader = new IndexReader(spark, dir)
    val ls = new LocalServing(reader)
    assert(ls.bm25TopK("zzzznotaterm", 10).isEmpty)
    assert(ls.bm25TopK("", 10).isEmpty)
  }

  test("tombstoned docs are excluded, identically to the distributed path") {
    import spark.implicits._
    // fresh index (delete mutates on-disk state)
    val docs = (0L until 40L).map(i => (i, s"pear plum word$i"))
    val d = java.nio.file.Files.createTempDirectory("graft_lsd_").toString
    IndexBuilder.build(spark, docs.toDF("docId", "content"), d,
      IndexConfig(tokenizerName = "TokenDelimit", nShards = 2,
        buildPartitions = 2, hotTermDf = 100000L, nSalts = 1))
    val reader = new IndexReader(spark, d)
    Deletes.delete(reader, org.apache.spark.sql.functions.col("docId").isin(3L, 17L))
    reader.invalidateDeletes()
    val ls = new LocalServing(reader)
    val loc = ls.bm25TopK("pear", 40)
    assert(loc == distributed(reader, "pear", 40))
    assert(!loc.exists(s => s.docId == 3L || s.docId == 17L) && loc.nonEmpty)
  }

  test("Dataset view is a LocalRelation that composes without a search job") {
    val reader = new IndexReader(spark, dir)
    val ls = new LocalServing(reader)
    val ds = ls.bm25TopKDs("alpha", 10)
    val plan = ds.queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), s"expected LocalRelation, got:\n$plan")
    assert(ds.count() == 10)
  }

  test("metrics: one-row snapshot tracks hits/misses/bytes") {
    val reader = new IndexReader(spark, dir)
    val ls = new LocalServing(reader)
    ls.bm25TopK("alpha", 5)
    ls.bm25TopK("alpha", 5)
    val m = ls.metrics(spark).collect().head
    assert(m.schema.fieldNames.toSeq ==
      Seq("hits", "misses", "fallbacks", "cached_bytes", "oversized_terms"))
    assert(m.getLong(0) >= 1L, "second query must register a cache hit")
    assert(m.getLong(1) >= 1L && m.getLong(3) > 0L)
  }
}
