package graft.query

import org.scalatest.funsuite.AnyFunSuite

class QueryParserSpec extends AnyFunSuite {
  import QueryParser._

  test("bare words fold left with default AND") {
    assert(parse("a b c").root ==
      And(And(Match("a", false), Match("b", false)), Match("c", false)))
  }

  test("explicit + - OR operators") {
    assert(parse("a +b").root == And(Match("a", false), Match("b", false)))
    assert(parse("a -b").root == AndNot(Match("a", false), Match("b", false)))
    assert(parse("a OR b").root == Or(Match("a", false), Match("b", false)))
  }

  test("parens group") {
    assert(parse("a (b OR c)").root ==
      And(Match("a", false), Or(Match("b", false), Match("c", false))))
  }

  test("quoted phrase") {
    assert(parse("\"fast key\"").root == Match("fast key", true))
    assert(parse("a \"b c\"").root == And(Match("a", false), Match("b c", true)))
  }

  test("column predicates") {
    assert(parse("col:v").root == ColPred("col", "", "v"))
    assert(parse("col:!v").root == ColPred("col", "!", "v"))
    assert(parse("col:>=10").root == ColPred("col", ">=", "10"))
    assert(parse("col:@word").root == ColPred("col", "@", "word"))
    assert(parse("col:^pre").root == ColPred("col", "^", "pre"))
    assert(parse("col:$suf").root == ColPred("col", "$", "suf"))
    assert(parse("col:~re.*x").root == ColPred("col", "~", "re.*x"))
  }

  test("trailing star is prefix search") {
    assert(parse("abc*").root == Prefix("abc"))
  }

  test("near and similar pragmas") {
    assert(parse("*N3\"a b\"").root == Near("a b", 3))
    assert(parse("*N\"a b\"").root == Near("a b", 10))
    assert(parse("*S\"doc text\"").root == Similar("doc text", 0))
    assert(parse("*S7\"doc text\"").root == Similar("doc text", 7))
  }

  test("escalation pragma records threshold") {
    val p = parse("*E5 word")
    assert(p.escalationThreshold.contains(5L))
    assert(p.root == Match("word", false))
  }

  test("adjust operators carry weights") {
    assert(parse("a >b").root == Adjust(Match("a", false), Match("b", false), 2.0))
    assert(parse("a <b").root == Adjust(Match("a", false), Match("b", false), 0.5))
    assert(parse("a ~b").root == Adjust(Match("a", false), Match("b", false), -1.0))
  }

  test("mixed: spark -dup OR phrase") {
    assert(parse("""spark -dup OR "fast key"""").root ==
      Or(AndNot(Match("spark", false), Match("dup", false)), Match("fast key", true)))
  }
}
