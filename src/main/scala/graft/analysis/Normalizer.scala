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
  * @param cps        normalized codepoints (blank characters removed)
  * @param types      char class per normalized codepoint ([[CharType]])
  * @param blanks     true when a blank followed this char in the original text
  * @param offsets    original codepoint index where this normalized codepoint
  *                   STARTS (cluster base — the "checks" analogue used by
  *                   highlight/snippet span starts)
  * @param endOffsets end-exclusive original codepoint index this normalized
  *                   codepoint covers — for a composed base+marks cluster this
  *                   is base + clusterSize, so span ends include the marks
  */
final class Normalized(
    val cps: Array[Int],
    val types: Array[Byte],
    val blanks: Array[Boolean],
    val offsets: Array[Int],
    val endOffsets: Array[Int],
    val length: Int
) {
  def this(cps: Array[Int], types: Array[Byte], blanks: Array[Boolean], offsets: Array[Int]) =
    this(cps, types, blanks, offsets, offsets.map(_ + 1), cps.length)
  def text: String = new String(cps, 0, length)
  def slice(from: Int, until: Int): String = new String(cps, from, until - from)
}

/** `NormalizerAuto` for UTF-8 input: NFKC + lowercasing + blank tracking
  * (reference lib/normalizer.c:1177-1191; generated NFKC tables in
  * lib/nfkc.c).
  *
  * Coverage, precisely: the mapping is the JDK's Unicode NFKC (the public
  * standard the reference's generated tables implement), so EVERY Unicode
  * block normalizes — full-width/half-width forms, compatibility
  * ligatures, circled/superscript digits, Hangul compatibility jamo, CJK
  * compatibility ideographs, all singleton decompositions. Combining
  * sequences compose at the cluster level — base+marks (decomposed
  * "e"+U+0301 ≡ precomposed "é") and Hangul conjoining jamo L+V+T (NFD
  * Korean ≡ precomposed syllables, the form macOS emits) — matching the
  * reference's grn_nfkc_compose. Out of scope: canonical REORDERING
  * across a cluster boundary (marks separated from their base by
  * unrelated codepoints), which needs full-string normalization. Each
  * normalized codepoint maps to its cluster's original span
  * [offsets(k), endOffsets(k)), which is what highlight/snippet need.
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

  /** Does `cp` extend the current base's cluster? Combining marks (Mn/Mc/Me)
    * and Hangul vowel/trailing conjoining jamo: a base followed by these is
    * normalized as one cluster so decomposed input ("e"+U+0301, or NFD
    * Korean L+V+T jamo) composes to the same codepoints as precomposed
    * input — the reference's nfkc tables compose too (lib/nfkc.c
    * grn_nfkc_compose), and web-crawl text mixes both forms freely (macOS
    * filenames are NFD). The caller's cp >= 0x300 pre-check keeps the
    * ASCII/ideograph fast path branchless.
    */
  @inline private def extendsCluster(cp: Int): Boolean = {
    if (cp >= 0x1161 && cp <= 0x1175) true // Hangul conjoining vowel jamo
    else if (cp >= 0x11a8 && cp <= 0x11c2) true // Hangul conjoining trailing jamo
    else {
      val t = Character.getType(cp)
      t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
        t == Character.ENCLOSING_MARK
    }
  }

  /** The 9 compat CLUSTER-batchim consonants — ㄳㄵㄶㄺㄻㄼㄽㄾㄿ — whose
    * NFKC image is a JONGSEONG (trailing) jamo, so vowel+them composes
    * (LV+T → LVT, e.g. ㄱㅏㄳ ≡ 갃). The other compat consonants map to
    * CHOSEONG (leading) jamo: the 19 modern ones (U+1100–U+1112, may start
    * a syllable) and the two Old-Hangul lead clusters ㅀ→U+111A / ㅄ→U+1121
    * (compose with nothing — excluded from both roles).
    */
  @inline private def isCompatTrail(cp: Int): Boolean =
    (cp >= 0x3133 && cp <= 0x3136 && cp != 0x3134) ||
      (cp >= 0x313a && cp <= 0x313f)

  /** Compat consonants whose NFKC image is a MODERN choseong — the ones a
    * following vowel composes with.
    */
  @inline private def isCompatLead(cp: Int): Boolean =
    cp >= 0x3131 && cp <= 0x314e && !isCompatTrail(cp) &&
      cp != 0x3140 && cp != 0x3144

  /** Cluster extension with the PREVIOUS codepoint in hand, for Hangul
    * COMPATIBILITY jamo (U+3131–U+3163, what legacy Korean IMEs and named
    * HTML entities emit) — NFKC maps them through conjoining jamo and then
    * canonically composes, exactly like the NFD case above:
    *   - a compat VOWEL (U+314F–U+3163) extends after a leading consonant
    *     (compat lead or conjoining choseong): ㅎ+ㅏ ≡ 하;
    *   - a compat CLUSTER batchim ([[isCompatTrail]]) extends after a vowel
    *     (compat or conjoining V) or an LV syllable: ㄱㅏㄳ ≡ 가ㄳ ≡ 갃.
    * The prev-gates matter: unconditional extension would wrongly glue
    * "a"+"ㅏ" or "ㄳ"+"ㅏ" (jongseong+V composes with nothing). Simple
    * compat batchim (ㄴ etc.) need no case — NFKC maps them to choseong,
    * which full-string NFKC does not compose after a syllable either
    * (ㄱㅏㄴ ≡ 가 + ᄂ, pinned in NormalizerSpec).
    */
  @inline private def extendsClusterAfter(prev: Int, cp: Int): Boolean =
    extendsCluster(cp) ||
      (cp >= 0x314f && cp <= 0x3163 &&
        (isCompatLead(prev) || (prev >= 0x1100 && prev <= 0x1112))) ||
      (isCompatTrail(cp) &&
        ((prev >= 0x314f && prev <= 0x3163) || (prev >= 0x1161 && prev <= 0x1175) ||
          (prev >= 0xac00 && prev <= 0xd7a3 && (prev - 0xac00) % 28 == 0)))

  /** Per-codepoint NFKC: decompose/compose a single codepoint. Multi-codepoint
    * interactions (rare compositions) are intentionally out of scope — Groonga's
    * own table is primarily a per-char mapping.
    */
  private def nfkcOne(cp: Int): String = {
    if (cp < 0x80) return null // ASCII is NFKC-invariant; avoid allocation
    // WAVE DASH → ASCII tilde: Unicode defines NO compatibility mapping
    // for U+301C, but the reference's generated table adds one (the JP
    // wave-dash/fullwidth-tilde unification, lib/nfkc.c grn_nfkc_map1) —
    // match it so 〜 and ～ index identically (NfkcConformanceSpec)
    if (cp == 0x301c) return "~"
    // LATIN CAPITAL I WITH DOT ABOVE lowercases to i + COMBINING DOT
    // ABOVE (the Unicode full lowercase mapping, which the reference's
    // table bakes in); per-codepoint Character.toLowerCase would drop the
    // dot — diverging on Turkish text
    if (cp == 0x130) return "i̇"
    val s = new String(Character.toChars(cp))
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    if (n == s) null else n
  }

  /** Reusable normalization buffers — every emitted slot is written
    * explicitly, so arrays need no zeroing between uses. One Scratch per
    * thread of use (e.g. per DocCombiner); the Normalized returned by
    * [[autoScratch]] is a VIEW over these arrays, valid until the next call
    * with the same Scratch.
    */
  final class Scratch {
    var cps = new Array[Int](256)
    var types = new Array[Byte](256)
    var blanks = new Array[Boolean](256)
    var offsets = new Array[Int](256)
    var endOffsets = new Array[Int](256)
    // per-call cluster-scan results (fields, not a tuple — the ASCII hot
    // path must not allocate per character)
    var clMapped: String = null
    var clChars: Int = 0
    var clCps: Int = 0
    def ensure(needed: Int): Unit = {
      if (needed > cps.length) {
        val cap = math.max(cps.length * 2, needed)
        cps = java.util.Arrays.copyOf(cps, cap)
        types = java.util.Arrays.copyOf(types, cap)
        blanks = java.util.Arrays.copyOf(blanks, cap)
        offsets = java.util.Arrays.copyOf(offsets, cap)
        endOffsets = java.util.Arrays.copyOf(endOffsets, cap)
      }
    }
  }

  /** Extend the cluster whose base codepoint `cp` starts at char index `i`,
    * and NFKC-map it; results land in `scr.clMapped` (null = identity
    * modulo lowercase) / `scr.clChars` / `scr.clCps`. Shared by
    * [[autoScratch]] and [[autoKeepBlank]] so the two paths cannot drift.
    */
  private def scanCluster(s: String, i: Int, n: Int, cp: Int, scr: Scratch): Unit = {
    var clChars = Character.charCount(cp)
    var clCps = 1
    var more = true
    var prev = cp
    while (more && i + clChars < n) {
      val mcp = s.codePointAt(i + clChars)
      if (mcp >= 0x300 && extendsClusterAfter(prev, mcp)) {
        clChars += Character.charCount(mcp); clCps += 1; prev = mcp
      } else more = false
    }
    scr.clMapped =
      if (clCps == 1) nfkcOne(cp)
      else java.text.Normalizer.normalize(
        s.substring(i, i + clChars), java.text.Normalizer.Form.NFKC)
    scr.clChars = clChars
    scr.clCps = clCps
  }

  def auto(s: String): Normalized = autoScratch(s, new Scratch)

  /** Identity-comparable function value for [[auto]] — lets tokenizers
    * recognize the standard normalizer and switch to the scratch path.
    */
  object AutoFn extends (String => Normalized) {
    def apply(s: String): Normalized = auto(s)
  }

  /** [[auto]] into caller-owned buffers: no per-call array zero-fill, no
    * trim copies — the memory-traffic discipline the build kernel needs to
    * scale with cores (allocation bandwidth is the contended resource at
    * high parallelism).
    */
  def autoScratch(s: String, scr: Scratch): Normalized = {
    val n = s.length
    scr.ensure(n + 8)
    var out = 0
    var i = 0 // char (UTF-16) index
    var cpIdx = 0 // codepoint index in original

    while (i < n) {
      val cp = s.codePointAt(i)
      if (isBlank(cp)) {
        if (out > 0) scr.blanks(out - 1) = true
        i += Character.charCount(cp)
        cpIdx += 1
      } else {
        // extend to the full base+marks cluster (see scanCluster) — for
        // ASCII and unmarked text the extension loop never iterates
        scanCluster(s, i, n, cp, scr)
        val mapped = scr.clMapped
        val clEnd = cpIdx + scr.clCps
        if (mapped == null) {
          val lc = Character.toLowerCase(cp)
          scr.ensure(out + 1)
          scr.cps(out) = lc; scr.types(out) = classify(lc)
          scr.blanks(out) = false
          scr.offsets(out) = cpIdx; scr.endOffsets(out) = clEnd
          out += 1
        } else {
          var j = 0
          while (j < mapped.length) {
            val mcp = mapped.codePointAt(j)
            if (isBlank(mcp)) { if (out > 0) scr.blanks(out - 1) = true }
            else {
              val lc = Character.toLowerCase(mcp)
              scr.ensure(out + 1)
              scr.cps(out) = lc; scr.types(out) = classify(lc)
              scr.blanks(out) = false
              scr.offsets(out) = cpIdx; scr.endOffsets(out) = clEnd
              out += 1
            }
            j += Character.charCount(mcp)
          }
        }
        i += scr.clChars
        cpIdx = clEnd
      }
    }
    new Normalized(scr.cps, scr.types, scr.blanks, scr.offsets, scr.endOffsets, out)
  }

  /** [[auto]] with blanks KEPT as codepoints — the `normalize` command's
    * default behavior (reference proc normalize: grn_string_open without
    * GRN_STRING_REMOVE_BLANK keeps whitespace in the normalized text).
    * Blanks classify as [[CharType.Others]] like the reference's tables.
    */
  def autoKeepBlank(s: String): Normalized = {
    val n = s.length
    val scr = new Scratch
    scr.ensure(n + 8)
    var out = 0
    var i = 0
    var cpIdx = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isBlank(cp)) {
        scr.ensure(out + 1)
        scr.cps(out) = cp; scr.types(out) = CharType.Others
        scr.blanks(out) = true
        scr.offsets(out) = cpIdx; scr.endOffsets(out) = cpIdx + 1
        out += 1
        i += Character.charCount(cp)
        cpIdx += 1
      } else {
        // base+marks cluster composition — same scanCluster as autoScratch
        scanCluster(s, i, n, cp, scr)
        val mapped = scr.clMapped
        val clEnd = cpIdx + scr.clCps
        if (mapped == null) {
          val lc = Character.toLowerCase(cp)
          scr.ensure(out + 1)
          scr.cps(out) = lc; scr.types(out) = classify(lc)
          scr.blanks(out) = false
          scr.offsets(out) = cpIdx; scr.endOffsets(out) = clEnd
          out += 1
        } else {
          var j = 0
          while (j < mapped.length) {
            val mcp = mapped.codePointAt(j)
            val blank = isBlank(mcp)
            val lc = if (blank) mcp else Character.toLowerCase(mcp)
            scr.ensure(out + 1)
            scr.cps(out) = lc
            scr.types(out) = if (blank) CharType.Others else classify(lc)
            scr.blanks(out) = blank
            scr.offsets(out) = cpIdx; scr.endOffsets(out) = clEnd
            out += 1
            j += Character.charCount(mcp)
          }
        }
        i += scr.clChars
        cpIdx = clEnd
      }
    }
    new Normalized(scr.cps, scr.types, scr.blanks, scr.offsets, scr.endOffsets, out)
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
