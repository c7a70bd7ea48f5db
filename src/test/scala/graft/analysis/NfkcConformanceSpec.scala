package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** NFKC conformance sweep against the reference's OWN generated mapping
  * table: parse `grn_nfkc_map1` out of the reference's lib/nfkc.c (a
  * nested switch over UTF-8 bytes, generated from public Unicode data —
  * read at test time, nothing derived is checked in) and compare every
  * single-codepoint mapping against this library's normalizer pipeline.
  *
  * Measured coverage (also documented in COVERAGE.md):
  *   - 4,755 table entries, 4,608 agree byte-for-byte after both sides'
  *     blank handling (96.9%);
  *   - 147 divergences are CASE-ONLY: the reference's generated table
  *     fails to lowercase those codepoints (e.g. U+03D2 GREEK UPSILON WITH
  *     HOOK maps to uppercase Υ there) while this normalizer lowercases
  *     everything — strictly more normalization, internally consistent on
  *     both sides (index and query agree within each engine);
  *   - 0 substantive divergences: the one the sweep originally found —
  *     Groonga's custom WAVE DASH 〜→~ unification, absent from Unicode
  *     NFKC — is adopted in Normalizer.nfkcOne.
  * Beyond the table, the JDK implements a NEWER Unicode version than the
  * reference's generated data, so codepoints the reference passes through
  * may still normalize here — a superset, never a conflict.
  */
class NfkcConformanceSpec extends AnyFunSuite {

  private val refPath = "/root/reference/lib/nfkc.c"

  /** Parse grn_nfkc_map1: nested `switch (str[N])` / `case 0xXX :` /
    * `if (str[N] == 0xXX) {` blocks with `return "\xAA\xBB";` leaves.
    * Fallthrough case groups share their leaf; multi-level prefixes are
    * the cartesian product of the pending case bytes per level.
    */
  private def parseMap1(): Map[Seq[Int], Array[Byte]] = {
    val lines = scala.io.Source.fromFile(refPath, "ISO-8859-1").getLines().toVector
    val start = lines.indexWhere(_.startsWith("grn_nfkc_map1"))
    val end = lines.indexWhere(_.startsWith("grn_nfkc_map2"))
    assert(start > 0 && end > start, "reference nfkc.c layout changed")
    val ReSwitch = """\s*switch \(str\[(\d+)\]\) \{""".r
    val ReIf = """\s*if \(str\[(\d+)\] == (0x[0-9A-Fa-f]+)\) \{""".r
    val ReCase = """\s*case (0x[0-9A-Fa-f]+) :""".r
    val ReRet = """\s*return "((?:\\x[0-9A-Fa-f]{2})*)";""".r
    val ReBreak = """\s*break;""".r
    val ReClose = """\s*\}\s*""".r
    val ReHex = """\\x([0-9A-Fa-f]{2})""".r
    val frames = mutable.Stack[mutable.ArrayBuffer[Int]]()
    val out = mutable.Map[Seq[Int], Array[Byte]]()
    def emit(value: Array[Byte]): Unit = {
      // cartesian product over the pending bytes of every open level
      def rec(levels: List[Seq[Int]], acc: List[Int]): Unit = levels match {
        case Nil => out(acc.reverse) = value
        case h :: t => h.foreach(b => rec(t, b :: acc))
      }
      rec(frames.toList.reverse.map(_.toSeq), Nil)
    }
    lines.slice(start + 2, end).foreach {
      case ReSwitch(_) => frames.push(mutable.ArrayBuffer[Int]())
      case ReIf(_, hex) =>
        frames.push(mutable.ArrayBuffer(Integer.decode(hex).intValue))
      case ReCase(hex) => frames.top += Integer.decode(hex).intValue
      case ReRet(esc) =>
        emit(ReHex.findAllMatchIn(esc)
          .map(m => Integer.parseInt(m.group(1), 16).toByte).toArray)
      case ReBreak() => if (frames.nonEmpty) frames.top.clear()
      case ReClose() => if (frames.nonEmpty) frames.pop(): Unit
      case _ => ()
    }
    out.toMap
  }

  private def isBlankCp(cp: Int): Boolean =
    Character.isWhitespace(cp) || cp == 0x3000 || cp == 0xfffe
  private def stripBlanks(s: String): String =
    s.codePoints().toArray.filterNot(isBlankCp)
      .flatMap(Character.toChars(_).toSeq).mkString

  test("normalizer conforms to the reference's generated map1 table") {
    val table = parseMap1()
    assert(table.size == 4755, s"map1 parse drifted: ${table.size} entries")
    var agree = 0
    val caseOnly = mutable.ArrayBuffer[Int]()
    val substantive = mutable.ArrayBuffer[(Int, String, String)]()
    table.foreach { case (bytes, valueBytes) =>
      val src = new String(bytes.map(_.toByte).toArray, "UTF-8")
      val want = new String(valueBytes, "UTF-8")
      assert(src.codePointCount(0, src.length) == 1, s"multi-cp key $src")
      val cp = src.codePointAt(0)
      // run BOTH sides through the pipeline's blank handling: the
      // reference applies map1 inside GRN_STRING_REMOVE_BLANK too
      val ours = Normalizer.auto(src).text
      val wantFinal = stripBlanks(want)
      if (ours == wantFinal) agree += 1
      else if (ours == wantFinal.toLowerCase) caseOnly += cp
      else substantive += ((cp, wantFinal, ours))
    }
    assert(substantive.isEmpty,
      s"substantive NFKC divergences vs the reference table: " +
        substantive.take(20).map { case (cp, w, o) =>
          f"U+$cp%04X ref=$w ours=$o" }.mkString(", "))
    assert(agree >= 4600, s"agreement dropped: $agree/4755")
    assert(caseOnly.size <= 160,
      s"case-only divergences grew: ${caseOnly.size} (ref table misses " +
        "lowercase on these; we lowercase everything)")
  }

  test("wave dash unifies with fullwidth tilde (reference custom mapping)") {
    assert(Normalizer.auto("〜").text == "~")
    assert(Normalizer.auto("～").text == "~") // FULLWIDTH TILDE (NFKC)
    // both index identically
    assert(Normalizer.auto("a〜b").text == Normalizer.auto("a～b").text)
  }
}
