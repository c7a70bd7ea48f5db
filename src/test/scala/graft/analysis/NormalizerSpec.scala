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

  test("composed cluster carries its base's original codepoint offset") {
    val n = Normalizer.auto("a é b") // blanks removed: a, é, b
    assert(n.text == "aéb")
    // offsets: a=0, é composes from base at original cp index 2, b=5
    assert(n.offsets.take(n.length).toSeq == Seq(0, 2, 5))
    // the char before a removed blank run is blank-flagged
    assert(n.blanks.take(n.length).toSeq == Seq(true, true, false))
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
