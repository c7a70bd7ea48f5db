package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.GraftCacheBridge
import org.scalatest.funsuite.AnyFunSuite

/** The dedup pipeline entry points must not leave session-lifetime
  * Dataset persists behind: a long-lived session making many dedup calls
  * would otherwise accumulate MEMORY_AND_DISK blocks until shutdown
  * (results hand back eager local checkpoints instead, whose RDD blocks
  * the ContextCleaner frees once the caller drops them).
  */
class DedupLeakSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs = {
    import spark.implicits._
    val texts = (0L until 20L).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta eta theta word$i"
      // 4 exact dups of doc 0, 2 near-dups of doc 1
      if (i >= 16L) "alpha beta gamma delta epsilon zeta eta theta word0"
      else if (i >= 14L) s"alpha beta gamma delta epsilon zeta eta theta word1 tail$i"
      else base
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def assertClean(label: String)(body: => Unit): Unit = {
    spark.catalog.clearCache()
    assert(GraftCacheBridge.datasetCacheIsEmpty(spark), s"dirty baseline before $label")
    body
    assert(GraftCacheBridge.datasetCacheIsEmpty(spark),
      s"$label left Dataset persists in the CacheManager")
  }

  test("nearDupPairs leaves no Dataset persists") {
    assertClean("nearDupPairs") {
      assert(Dedup.nearDupPairs(docs).count() >= 0)
    }
  }

  test("dedupCorpus leaves no Dataset persists and still dedups") {
    assertClean("dedupCorpus") {
      val survivors = Dedup.dedupCorpus(docs, thresholdQ3 = 800).count()
      assert(survivors <= 17, s"exact dups must collapse, got $survivors")
    }
  }

  test("simhashPairsBlocked leaves no Dataset persists") {
    assertClean("simhashPairsBlocked") {
      assert(Dedup.simhashPairsBlocked(Dedup.simhash(docs)).count() >= 0)
    }
  }

  test("jaccardForPairs and dedupClustersPropagate leave no Dataset persists") {
    import spark.implicits._
    assertClean("jaccardForPairs") {
      val pairs = Seq((0L, 16L), (1L, 14L)).toDF("a", "b")
      assert(Dedup.jaccardForPairs(docs, pairs).count() == 2)
    }
    assertClean("dedupClustersPropagate") {
      val pairs = Seq((0L, 16L), (16L, 17L)).toDF("a", "b")
      assert(Dedup.dedupClustersPropagate(pairs, Some(docs)).count() == 20)
    }
  }
}
