package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** NormalizerAuto unit behavior — NFKC mapping breadth, combining-sequence
  * composition, blank tracking, and offset fidelity.
  */
class NormalizerSpec extends AnyFunSuite {

  test("decomposed and precomposed input normalize to identical codepoints") {
    // "café" with é as e + COMBINING ACUTE ACCENT vs precomposed U+00E9
    val decomposed = "café"
    val precomposed = "café"
    assert(Normalizer.auto(decomposed).text == Normalizer.auto(precomposed).text)
    assert(Normalizer.auto(precomposed).text == "café")
    // same through the keep-blank (normalize command) path
    assert(Normalizer.autoKeepBlank(decomposed).text ==
      Normalizer.autoKeepBlank(precomposed).text)
  }

  test("composed cluster carries its full original span (offsets/endOffsets)") {
    val n = Normalizer.auto("a e\u0301 b") // blanks removed: a, \u00e9, b
    assert(n.text == "a\u00e9b") // composed
    // offsets: a=0, \u00e9 composes from base at original cp index 2, b=5
    assert(n.offsets.take(n.length).toSeq == Seq(0, 2, 5))
    // endOffsets: \u00e9's cluster spans original cps [2, 4) — the combining
    // mark is INSIDE the span, so highlight/snippet tags include it
    assert(n.endOffsets.take(n.length).toSeq == Seq(1, 4, 6))
    // the char before a removed blank run is blank-flagged
    assert(n.blanks.take(n.length).toSeq == Seq(true, true, false))
  }

  test("highlight keeps the combining mark inside the tagged span") {
    val decomposed = "cafe\u0301" // e + U+0301
    val html = graft.functions.TextFunctions.highlightHtmlOf(decomposed, Seq("caf\u00e9"))
    assert(html == s"<span class=\"keyword\">$decomposed</span>",
      s"mark leaked outside the span: <$html>")
  }

  test("NFD Korean (conjoining jamo) composes to precomposed syllables") {
    val precomposed = "\ud55c\uad6d\uc5b4" // 한국어
    val nfd = java.text.Normalizer.normalize(precomposed, java.text.Normalizer.Form.NFD)
    assert(nfd.length > precomposed.length) // really decomposed
    assert(Normalizer.auto(nfd).text == Normalizer.auto(precomposed).text)
    assert(Normalizer.auto(nfd).text == precomposed)
    // spans: each composed syllable covers its whole L+V(+T) jamo cluster
    val n = Normalizer.auto(nfd)
    assert(n.length == 3 && n.endOffsets(0) - n.offsets(0) >= 2)
  }

  test("compatibility jamo (legacy IME Korean) composes like full-string NFKC") {
    // ㅎ+ㅏ (U+314E U+314F, compat jamo) ≡ 하 — NFKC maps compat jamo to
    // conjoining jamo, then canonically composes L+V
    val compat = "ㅎㅏ"
    assert(Normalizer.auto(compat).text == "하")
    // the composed syllable's span covers BOTH source codepoints
    val n = Normalizer.auto(compat)
    assert(n.length == 1 && n.offsets(0) == 0 && n.endOffsets(0) == 2)
    // ㄱ+ㅏ with a trailing compat consonant: the tail maps to a LEADING
    // jamo (full-string NFKC does not compose it either)
    assert(Normalizer.auto("ㄱㅏㄱ").text ==
      java.text.Normalizer.normalize("ㄱㅏㄱ",
        java.text.Normalizer.Form.NFKC))
    // a compat vowel NOT after a consonant must stand alone, never glue to
    // a latin base
    assert(Normalizer.auto("aㅏ").text == "aᅡ")
  }

  test("compat CLUSTER batchim (ㄳ family) composes LV+T like full NFKC") {
    def nfkc(s: String) =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    // ㄱ+ㅏ+ㄳ ≡ 갃 (U+AC03): the 9 cluster batchim map to JONGSEONG and
    // LV+T composes — the simple-batchim case (ㄴ→choseong) must NOT
    assert(Normalizer.auto("ㄱㅏㄳ").text == "갃" && nfkc("ㄱㅏㄳ") == "갃")
    // precomposed LV + compat cluster batchim composes too
    assert(Normalizer.auto("가ㄳ").text == "갃")
    // ...but not after an LVT syllable (T slot taken)
    assert(Normalizer.auto("각ㄳ").text == nfkc("각ㄳ"))
    // ㄳ NOT after a vowel stands alone (jongseong composes with nothing
    // that follows) — same codepoints as full NFKC
    assert(Normalizer.auto("ㄳㅏ").text == nfkc("ㄳㅏ"))
    // ㅀ/ㅄ map to Old-Hangul CHOSEONG — no composition either side
    assert(Normalizer.auto("ㅀㅏ").text == nfkc("ㅀㅏ"))
    assert(Normalizer.auto("ㅄㅏ").text == nfkc("ㅄㅏ"))
    // all 9 cluster batchim against the JDK's full-string NFKC
    for (t <- Seq(0x3133, 0x3135, 0x3136, 0x313a, 0x313b, 0x313c, 0x313d,
        0x313e, 0x313f)) {
      val s = "ㄱㅏ" + new String(Character.toChars(t))
      assert(Normalizer.auto(s).text == nfkc(s), f"U+$t%04X")
    }
  }

  test("singleton NFKC mappings cover compat blocks (full-width, ligature, circled)") {
    assert(Normalizer.auto("Ｈｅｌｌｏ").text == "hello") // full-width
    assert(Normalizer.auto("ﬁle").text == "file") // ﬁ ligature
    assert(Normalizer.auto("①②").text == "12") // circled digits
    assert(Normalizer.auto("㎒").text == "mhz") // SQUARE MHZ, lowercased
  }

  test("combining mark after a blank stands alone without corrupting offsets") {
    val n = Normalizer.auto("a ́b") // orphan mark: its own cluster
    assert(n.offsets.take(n.length).toSeq.zipWithIndex.forall { case (o, _) => o >= 0 })
    assert(n.text.last == 'b')
  }

  test("multiple marks on one base compose what NFKC composes") {
    // o + combining circumflex => ô (single codepoint after NFKC)
    val n = Normalizer.auto("ô")
    assert(n.text == "ô" && n.length == 1)
  }
}
