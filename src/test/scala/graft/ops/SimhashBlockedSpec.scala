package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Manku block-permutation SimHash pairing: exact recall at every block
  * count (pigeonhole), byte-identical to the historical 4-band scheme at
  * blocks = 4, and bounded bucket populations at large N (the reason the
  * block count is the corpus-scale dial).
  */
class SimhashBlockedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus = {
    // clusters of near-identical docs => small hamming distances, plus
    // unrelated docs => large distances
    def base(i: Int) = (0 until 20)
      .map(w => s"word${(i * 31 + w * 7) % 13}").mkString(" ")
    ((0 until 40).map(i => (i.toLong, base(i / 4))) ++
      (100 until 120).map(i => (i.toLong, s"totally other content $i " + base(i))))
      .toDF("doc_id", "text")
  }

  test("blocked(6) == blocked(4) == brute-force hamming pairs") {
    val fps = Dedup.simhash(corpus)
    fps.persist(); fps.count()
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select(col("a"), col("b"), col("hamming").cast("long"))
        .as[(Long, Long, Long)].collect().toSet
    val b4 = pairsOf(Dedup.simhashPairs(fps, maxDist = 3))
    val b6 = pairsOf(Dedup.simhashPairsBlocked(fps, maxDist = 3, blocks = 6))
    val b8 = pairsOf(Dedup.simhashPairsBlocked(fps, maxDist = 3, blocks = 8))
    // brute force over the collected fingerprints
    val rows = fps.select("doc_id", "sh_lo", "sh_hi").as[(Long, Long, Long)].collect()
    val brute = (for {
      x <- rows; y <- rows if x._1 < y._1
      h = java.lang.Long.bitCount(x._2 ^ y._2) + java.lang.Long.bitCount(x._3 ^ y._3)
      if h <= 3
    } yield (x._1, y._1, h.toLong)).toSet
    assert(brute.nonEmpty, "corpus must contain hamming<=3 pairs")
    assert(b4 == brute && b6 == brute && b8 == brute)
    fps.unpersist()
  }

  test("blocked keys bound bucket population at large N where 16-bit bands do not") {
    // 300k synthetic random fingerprints (md5-derived, deterministic)
    val n = 300000L
    val fps = spark.range(n).selectExpr(
      "id AS doc_id",
      "CAST(conv(substring(md5(concat('fp', id)), 1, 8), 16, 10) AS BIGINT) AS sh_lo",
      "CAST(conv(substring(md5(concat('fp', id)), 9, 8), 16, 10) AS BIGINT) AS sh_hi")
    def maxBucket(blocks: Int): Long = {
      // reproduce the table keys the pairing joins on and take the largest
      // population — the per-bucket join cost driver
      val widths = Array.tabulate(blocks)(i => 64 / blocks + (if (i < 64 % blocks) 1 else 0))
      val starts = widths.scanLeft(0)(_ + _)
      def bv(s: Int, l: Int): String = {
        val mask = (1L << l) - 1
        if (s >= 32) s"(shiftright(sh_hi, ${s - 32}) & ${mask}L)"
        else if (s + l <= 32) s"(shiftright(sh_lo, $s) & ${mask}L)"
        else {
          val lo = 32 - s
          s"((shiftright(sh_lo, $s) & ${(1L << lo) - 1}L) | shiftleft(sh_hi & ${(1L << (l - lo)) - 1}L, $lo))"
        }
      }
      val combos = (0 until blocks).combinations(blocks - 3).toSeq
      val es = combos.zipWithIndex.map { case (c, ci) =>
        var sh = 0
        val parts = c.map { b =>
          val e = s"shiftleft(${bv(starts(b), widths(b))}, $sh)"; sh += widths(b); e
        }
        s"named_struct('t', $ci, 'k', ${parts.mkString(" | ")})"
      }
      fps.select(explode(expr(es.mkString("array(", ", ", ")"))).as("bb"))
        .groupBy("bb.t", "bb.k").agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0)
    }
    val banded = maxBucket(4) // 16-bit keys: population ~ N/2^16 per bucket
    val blocked = maxBucket(6) // ~31-33-bit keys: population ~ N/2^31
    assert(banded >= 8, s"banded max bucket should be crowded at N=$n, got $banded")
    assert(blocked <= 4, s"blocked max bucket must stay near 1, got $blocked")
  }
}
