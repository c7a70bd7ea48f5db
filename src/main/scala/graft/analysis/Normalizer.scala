package graft.analysis

/** Character classes mirroring Groonga's `grn_char_type`
  * (reference include/groonga/groonga.h `GRN_CHAR_*`, tables lib/nfkc.c).
  */
object CharType {
  val Null: Byte     = 0
  val Alpha: Byte    = 1
  val Digit: Byte    = 2
  val Symbol: Byte   = 3
  val Hiragana: Byte = 4
  val Katakana: Byte = 5
  val Kanji: Byte    = 6
  val Others: Byte   = 7
}

/** A normalized string with per-character metadata, the Spark-side analogue of
  * Groonga's `grn_string` opened with
  * `GRN_STRING_REMOVE_BLANK | GRN_STRING_WITH_TYPES` (reference lib/string.c):
  * blanks are removed from the normalized text and a blank flag is set on the
  * character that preceded the removed run.
  *
  * @param cps     normalized codepoints (blank characters removed)
  * @param types   char class per normalized codepoint ([[CharType]])
  * @param blanks  true when a blank followed this char in the original text
  * @param offsets original codepoint index for each normalized codepoint
  *                (the "checks" analogue used by highlight/snippet)
  */
final class Normalized(
    val cps: Array[Int],
    val types: Array[Byte],
    val blanks: Array[Boolean],
    val offsets: Array[Int]
) {
  def length: Int = cps.length
  def text: String = new String(cps, 0, cps.length)
  def slice(from: Int, until: Int): String = new String(cps, from, until - from)
}

/** `NormalizerAuto` for UTF-8 input: NFKC + per-codepoint lowercasing + blank
  * tracking (reference lib/normalizer.c:1177-1191; generated NFKC tables in
  * lib/nfkc.c). We use the JDK's Unicode NFKC (public standard) applied
  * per-codepoint so original offsets are preserved; exact for ASCII, which is
  * the payload (source code / english docs) this engine targets.
  */
object Normalizer {

  def classify(cp: Int): Byte = {
    if (cp >= 0x3041 && cp <= 0x309f) CharType.Hiragana
    else if (cp >= 0x30a0 && cp <= 0x30ff) CharType.Katakana
    else if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf) ||
      (cp >= 0xf900 && cp <= 0xfaff)) CharType.Kanji
    else if (cp >= 'a' && cp <= 'z') CharType.Alpha // fast path
    else if (cp >= '0' && cp <= '9') CharType.Digit
    else if (Character.isLetter(cp)) CharType.Alpha
    else if (Character.isDigit(cp)) CharType.Digit
    else if (Character.isISOControl(cp)) CharType.Others
    else CharType.Symbol
  }

  @inline private def isBlank(cp: Int): Boolean =
    Character.isWhitespace(cp) || cp == 0x3000 || cp == 0xfffe

  /** Per-codepoint NFKC: decompose/compose a single codepoint. Multi-codepoint
    * interactions (rare compositions) are intentionally out of scope — Groonga's
    * own table is primarily a per-char mapping.
    */
  private def nfkcOne(cp: Int): String = {
    if (cp < 0x80) return null // ASCII is NFKC-invariant; avoid allocation
    val s = new String(Character.toChars(cp))
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    if (n == s) null else n
  }

  def auto(s: String): Normalized = {
    val n = s.length
    val cps = new Array[Int](n + 8)
    val types = new Array[Byte](n + 8)
    val blanks = new Array[Boolean](n + 8)
    val offsets = new Array[Int](n + 8)
    var out = 0
    var i = 0 // char (UTF-16) index
    var cpIdx = 0 // codepoint index in original

    var bufCps = cps; var bufTypes = types; var bufBlanks = blanks; var bufOffs = offsets
    def ensure(extra: Int): Unit = {
      if (out + extra > bufCps.length) {
        val cap = math.max(bufCps.length * 2, out + extra)
        bufCps = java.util.Arrays.copyOf(bufCps, cap)
        bufTypes = java.util.Arrays.copyOf(bufTypes, cap)
        bufBlanks = java.util.Arrays.copyOf(bufBlanks, cap)
        bufOffs = java.util.Arrays.copyOf(bufOffs, cap)
      }
    }

    while (i < n) {
      val cp = s.codePointAt(i)
      if (isBlank(cp)) {
        if (out > 0) bufBlanks(out - 1) = true
      } else {
        val mapped = nfkcOne(cp)
        if (mapped == null) {
          val lc = Character.toLowerCase(cp)
          ensure(1)
          bufCps(out) = lc; bufTypes(out) = classify(lc)
          bufBlanks(out) = false; bufOffs(out) = cpIdx
          out += 1
        } else {
          var j = 0
          while (j < mapped.length) {
            val mcp = mapped.codePointAt(j)
            if (isBlank(mcp)) { if (out > 0) bufBlanks(out - 1) = true }
            else {
              val lc = Character.toLowerCase(mcp)
              ensure(1)
              bufCps(out) = lc; bufTypes(out) = classify(lc)
              bufBlanks(out) = false; bufOffs(out) = cpIdx
              out += 1
            }
            j += Character.charCount(mcp)
          }
        }
      }
      i += Character.charCount(cp)
      cpIdx += 1
    }
    new Normalized(
      java.util.Arrays.copyOf(bufCps, out),
      java.util.Arrays.copyOf(bufTypes, out),
      java.util.Arrays.copyOf(bufBlanks, out),
      java.util.Arrays.copyOf(bufOffs, out)
    )
  }

  /** Raw mode = lexicon without a normalizer, n-gram flavor: the reference's
    * grn_string_open without a normalizer yields the original text with NO
    * char types and NO blank removal (reference lib/string.c), so the n-gram
    * tokenizer's run-grouping and blank-splitting are inert — every char
    * (including spaces, original case) is gram-able.
    */
  def raw(s: String): Normalized = {
    val n = s.length
    val cps = new Array[Int](n)
    val offsets = new Array[Int](n)
    var out = 0; var i = 0; var cpIdx = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      cps(out) = cp; offsets(out) = cpIdx; out += 1
      i += Character.charCount(cp)
      cpIdx += 1
    }
    new Normalized(
      java.util.Arrays.copyOf(cps, out),
      Array.fill[Byte](out)(CharType.Others),
      new Array[Boolean](out),
      java.util.Arrays.copyOf(offsets, out)
    )
  }

  /** Identity "normalizer" (no normalizer configured): types still computed so
    * the n-gram tokenizer can group runs, but no case folding / NFKC.
    */
  def none(s: String): Normalized = {
    val n = s.length
    val cps = new Array[Int](n)
    val types = new Array[Byte](n)
    val blanks = new Array[Boolean](n)
    val offsets = new Array[Int](n)
    var out = 0; var i = 0; var cpIdx = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isBlank(cp)) { if (out > 0) blanks(out - 1) = true }
      else {
        cps(out) = cp; types(out) = classify(cp); offsets(out) = cpIdx; out += 1
      }
      i += Character.charCount(cp)
      cpIdx += 1
    }
    new Normalized(
      java.util.Arrays.copyOf(cps, out),
      java.util.Arrays.copyOf(types, out),
      java.util.Arrays.copyOf(blanks, out),
      java.util.Arrays.copyOf(offsets, out)
    )
  }
}
