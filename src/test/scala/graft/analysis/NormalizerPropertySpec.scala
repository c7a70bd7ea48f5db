package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized invariants for NormalizerAuto over a mixed multilingual pool
  * (seeded — deterministic in CI). Complements NormalizerSpec's fixed cases
  * with breadth: thousands of strings mixing ASCII, accented Latin,
  * combining marks, full-width forms, CJK, and blanks.
  */
class NormalizerPropertySpec extends AnyFunSuite {

  // No Zs-category space variants (NBSP etc.) in the pool: their NFKC image
  // IS a blank, which would make the blank-strip comparison below ambiguous.
  private val pool: IndexedSeq[Int] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).map(_.toInt) ++
      "()[]{};,._-+*/#!?\"'".map(_.toInt) ++
      "àéîõüÅÇñăōżé".map(_.toInt) ++
      Seq(0x301, 0x302, 0x308, 0x30a) ++ // combining marks
      "ＡＢｃｄ０１".map(_.toInt) ++ // full-width forms
      "日本語漢字中文".map(_.toInt) ++
      "한국어".map(_.toInt) ++ // precomposed Hangul (NFD test decomposes)
      Seq(0x1112, 0x1161, 0x11ab) ++ // conjoining jamo (an NFD 한)
      "ﬁﬂ①㎒".map(_.toInt) ++
      Seq(' ', '\t', '\n').map(_.toInt) ++ Seq(0x3000)

  private def gen(rnd: Random): String = {
    val len = rnd.nextInt(40)
    val sb = new java.lang.StringBuilder
    (0 until len).foreach(_ => sb.appendCodePoint(pool(rnd.nextInt(pool.size))))
    sb.toString
  }

  private def cpCount(s: String): Int = s.codePointCount(0, s.length)

  test("offsets are in-range and non-decreasing on both paths") {
    val rnd = new Random(42)
    for (_ <- 0 until 3000) {
      val s = gen(rnd)
      val in = cpCount(s)
      for (n <- Seq(Normalizer.auto(s), Normalizer.autoKeepBlank(s))) {
        var prev = -1
        for (k <- 0 until n.length) {
          val o = n.offsets(k)
          assert(o >= 0 && (o < in || (in == 0 && o == 0)), s"offset $o out of range for <$s>")
          assert(o >= prev, s"offsets decreased at $k for <$s>")
          val e = n.endOffsets(k)
          assert(e > o && e <= in, s"endOffset $e invalid (start $o, input $in cps) for <$s>")
          prev = o
        }
      }
    }
  }

  test("auto equals keep-blank with blank codepoints stripped") {
    val rnd = new Random(7)
    def strip(t: String): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        if (!(Character.isWhitespace(cp) || cp == 0x3000 || cp == 0xfffe))
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      sb.toString
    }
    for (_ <- 0 until 3000) {
      val s = gen(rnd)
      assert(Normalizer.auto(s).text == strip(Normalizer.autoKeepBlank(s).text),
        s"paths disagree for <$s>")
    }
  }

  test("ASCII strings lowercase with whitespace removed") {
    val rnd = new Random(11)
    val ascii = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ " \t\n().;").map(_.toInt).toIndexedSeq
    for (_ <- 0 until 3000) {
      val len = rnd.nextInt(60)
      val s = new String((0 until len).map(_ => ascii(rnd.nextInt(ascii.size)).toChar).toArray)
      val expect = s.toLowerCase.filterNot(c => c == ' ' || c == '\t' || c == '\n')
      assert(Normalizer.auto(s).text == expect, s"ASCII mismatch for <$s>")
    }
  }

  test("NFD-decomposed input normalizes identically to the original") {
    val rnd = new Random(99)
    // restrict to chars whose NFD expansion is base + combining marks only
    // (Latin accents; excludes Hangul syllables, whose NFD jamo are not
    // combining marks and legitimately stay decomposed)
    for (_ <- 0 until 3000) {
      val s = gen(rnd)
      val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      assert(Normalizer.auto(nfd).text == Normalizer.auto(s).text,
        s"NFD form diverged for <$s>")
    }
  }
}
