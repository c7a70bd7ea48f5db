package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The typed MinHash/SimHash kernels must be BIT-IDENTICAL to the SQL
  * expression forms (the executable cross-engine specification that the
  * DuckDB gate oracles also recompute).
  */
class DedupKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // realistic text + edge cases: trailing space (Spark split keeps the
  // trailing empty string), fewer words than k (whole-text fallback),
  // repeated shingles, empty-ish strings, unicode
  private lazy val docs = (
    (0 until 40).map(i => (i.toLong, graft.core.Corpus.file(7L, i.toLong).content.take(400))) ++
      Seq(
        (100L, "one two three four five"),
        (101L, "one two three four five "), // trailing empty word
        (102L, "ab"), // shorter than k: whole text is the shingle
        (103L, "x x x x x x"), // all-identical shingles
        (104L, " "), // two empty words
        (105L, "naïve café über strings 日本語 テスト mixed in")
      )
  ).toDF("doc_id", "text")

  test("minhash kernel == expression form, bit for bit") {
    for (k <- Seq(2, 3)) {
      val fast = Dedup.minhashSignatures(docs, shingleK = k)
        .as[(Long, Seq[Long])].collect().toMap
      val ref = Dedup.minhashSignaturesExpr(docs, shingleK = k)
        .as[(Long, Seq[Long])].collect().toMap
      assert(fast.keySet == ref.keySet)
      fast.foreach { case (id, sig) =>
        assert(sig == ref(id), s"doc $id (k=$k): kernel sig differs")
      }
    }
  }

  test("fused band kernel == expression banding over expression signatures") {
    val fast = Dedup.minhashBands(docs).as[(Long, Int, Long)].collect().toSet
    val ref = Dedup.lshBands(Dedup.minhashSignaturesExpr(docs), bands = 16)
      .as[(Long, Int, Long)].collect().toSet
    assert(fast == ref)
  }

  test("simhash kernel == expression form, bit for bit") {
    val fast = Dedup.simhash(docs).as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val ref = Dedup.simhashExpr(docs).as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(fast == ref)
  }
}
