package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RkText

/** prefix_rk_search matching (reference grn_pat_prefix_rk_search
  * behavior, fixtures under select/function/prefix_rk_search).
  */
class RkTextSpec extends AnyFunSuite {

  test("romaji query prefix-matches katakana reading") {
    assert(RkText.prefixRkMatch("グルンガ", "gur"))
    assert(RkText.prefixRkMatch("グルンガ", "guru"))
    assert(RkText.prefixRkMatch("グルンガ", "gurunga"))
    assert(!RkText.prefixRkMatch("グルンガ", "gurx"))
    assert(!RkText.prefixRkMatch("グルンガ", "mur"))
  }

  test("hiragana and katakana queries prefix-match directly") {
    assert(RkText.prefixRkMatch("グルンガ", "ぐる"))
    assert(RkText.prefixRkMatch("グルンガ", "グル"))
    assert(!RkText.prefixRkMatch("グルンガ", "ガル"))
  }

  test("romanization variants and digraphs") {
    assert(RkText.prefixRkMatch("シンジュク", "shinjuku"))
    assert(RkText.prefixRkMatch("シンジュク", "sinzyuku"))
    assert(RkText.prefixRkMatch("シンジュク", "shinju"))
    assert(RkText.prefixRkMatch("ッタ", "tta"))
    assert(RkText.prefixRkMatch("チューリップ", "chu"))
  }

  test("hiragana keys convert before matching; empty query matches") {
    assert(RkText.prefixRkMatch("ぐるんが", "guru"))
    assert(RkText.prefixRkMatch("グルンガ", ""))
    assert(!RkText.prefixRkMatch(null, "a"))
  }
}
