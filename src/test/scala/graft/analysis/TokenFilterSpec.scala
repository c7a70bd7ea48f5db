package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

class TokenFilterSpec extends AnyFunSuite {

  test("porter stemmer classic vectors") {
    val cases = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "activate" -> "activ", "effective" -> "effect")
    cases.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("stemmer passes through non-lowercase-ascii") {
    assert(PorterStemmer.stem("Sp1") == "Sp1")
    assert(PorterStemmer.stem("ab") == "ab")
  }

  test("filtered tokenizer chain via byName") {
    val t = Tokenizers.byName("TokenDelimit+Stem")
    val terms = t.tokenize("running cats happily", TokenizeMode.Add).map(_.term)
    assert(terms == Vector("run", "cat", "happili"))
  }

  test("stopword filter drops terms, keeps positions of the rest") {
    val base = Tokenizers.TokenDelimit.tokenize("the quick fox", TokenizeMode.Add)
    val f = TokenFilters.stopWord(Set("the"))(base)
    assert(f.map(_.term) == Vector("quick", "fox"))
    assert(f.map(_.pos) == Vector(1, 2)) // positions unchanged (reference skips at search)
  }
}
