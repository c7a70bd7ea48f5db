package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized invariants for the repetition-signal kernel (seeded —
  * deterministic in CI): the while-loop/HashMap kernel must agree with an
  * obviously-correct groupBy reference on thousands of random word lists
  * (small alphabets force heavy duplication; empty tokens from doubled
  * spaces included), and the Catalyst expression spec must agree with the
  * kernel on a random sample through Spark.
  */
class RepetitionPropertySpec extends AnyFunSuite {

  /** Obviously-correct reference implementation (immutable collections). */
  private def naive(text: String): (Long, Long, Long, Long, Long, Long) = {
    val w = text.split(" ", -1)
    val n = w.length
    val nL = math.max(n, 1).toLong
    val dupWord = (n - w.distinct.length).toLong * 1000 / nL
    val top2 =
      if (n < 2) 0L
      else w.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).values.map(_.size).max.toLong
    val g5counts =
      if (n < 5) Nil
      else w.sliding(5).map(_.mkString(" ")).toSeq
        .groupBy(identity).values.map(_.size).toList
    val dup5 = g5counts.collect { case c if c > 1 => c.toLong }.sum
    (n.toLong, dupWord, top2, top2 * 2 * 1000 / nL, dup5,
      if (n >= 5) dup5 * 1000 / (n - 4) else 0L)
  }

  private def asTuple(m: TextAnalysis.RepMetrics) =
    (m.n_words, m.dup_word_frac_q3, m.top2_cnt, m.top2_frac_q3,
      m.dup5_cnt, m.dup5_frac_q3)

  private def gen(rnd: Random): String = {
    val alpha = 1 + rnd.nextInt(6) // tiny alphabets -> heavy repetition
    val len = rnd.nextInt(60)
    (0 until len).map { _ =>
      if (rnd.nextInt(20) == 0) "" // doubled-space artifact token
      else s"w${rnd.nextInt(alpha)}"
    }.mkString(" ")
  }

  test("kernel ≡ naive reference on 5000 random word lists") {
    val rnd = new Random(42)
    (1 to 5000).foreach { i =>
      val text = gen(rnd)
      val k = asTuple(TextAnalysis.repetitionMetrics(text))
      val e = naive(text)
      assert(k == e, s"case $i: <$text>")
    }
  }

  test("expression spec ≡ kernel on a random sample through Spark") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val rnd = new Random(7)
    val docs = (0L until 150L).map(i => (i, gen(rnd))).toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_words", "dup_word_frac_q3", "top2_cnt",
      "top2_frac_q3", "dup5_cnt", "dup5_frac_q3")
    val k = TextAnalysis.withRepetition(docs)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val e = TextAnalysis.withRepetitionExpr(docs)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(k == e)
  }
}
