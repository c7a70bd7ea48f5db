package graft.index

import graft.analysis.{Tokenizers, TokenizeMode}
import org.scalatest.funsuite.AnyFunSuite

/** The fused zero-allocation kernel must produce exactly the postings of the
  * naive tokenize→group path for every tokenizer and any input.
  */
class DocCombinerSpec extends AnyFunSuite {

  private def naive(tokName: String, content: String, withPos: Boolean): Map[String, (Int, Seq[Int])] = {
    val toks = Tokenizers.byName(tokName).tokenize(content, TokenizeMode.Add)
    toks.groupBy(_.term).map { case (t, ts) =>
      t -> (ts.size, if (withPos) ts.map(_.pos) else Seq.empty[Int])
    }
  }

  private def fused(tokName: String, content: String, withPos: Boolean): Map[String, (Int, Seq[Int])] = {
    val tok = Tokenizers.byName(tokName)
    val comb = new DocCombiner(withPos)
    DocCombiner.docPostings(tok, comb, 7L, content)
      .map { case (term, id, tf, ps) =>
        assert(id == 7L)
        term -> (tf, ps.toSeq)
      }.toMap
  }

  private val samples = Seq(
    "",
    "if (x == 1) { return fooBar; } // comment",
    "def foo(a: Int): Int = a + 42",
    "aa bb aa bb aa",
    "日本語のテキストです spark SQL",
    "x",
    "    ",
    "SELECT * FROM t WHERE a=1 AND b LIKE '%x%'",
    ("val " * 200) + "deep nesting",
  )

  for (tokName <- Seq("TokenBigram", "TokenDelimit", "TokenTrigram",
      "TokenBigramSplitSymbol", "TokenBigram+Stem")) {
    test(s"fused combine == naive combine ($tokName)") {
      for (s <- samples; withPos <- Seq(true, false)) {
        assert(fused(tokName, s, withPos) == naive(tokName, s, withPos), s"input=<$s> withPos=$withPos")
      }
    }
  }

  test("fused combine == naive on random strings (reused combiner, table reuse paths)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab1 {}.;\nxyz日本語"
    val tok = Tokenizers.byName("TokenBigram")
    val comb = new DocCombiner(true) // reuse across all docs: exercises reset/clear
    for (i <- 0 until 300) {
      val len = rnd.nextInt(400)
      val s = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = DocCombiner.docPostings(tok, comb, i.toLong, s)
        .map { case (t, _, tf, ps) => t -> (tf, ps.toSeq) }.toMap
      assert(got == naive("TokenBigram", s, withPos = true), s"iter $i input=<$s>")
    }
  }

  test("doclen counter equals total token count") {
    val tok = Tokenizers.byName("TokenBigram")
    val comb = new DocCombiner(true)
    val s = "if (x == 1) { return fooBar; }"
    DocCombiner.docPostings(tok, comb, 1L, s)
    assert(comb.docTokens == tok.tokenize(s, TokenizeMode.Add).size)
  }
}
