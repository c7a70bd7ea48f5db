package graft.functions

/** Romaji↔kana prefix matching for `prefix_rk_search(column, query)`
  * (reference grn_pat_prefix_rk_search, lib/pat.c rk conversion tables):
  * a query typed as romaji, hiragana, or katakana prefix-matches keys
  * stored in katakana — the IME-completion path of the suggest family.
  *
  * The reference walks the patricia trie converting each kana node to its
  * romaji renderings; at Spark scale the same predicate is a scan filter
  * (or a lexicon-pruned scan when the key table is sorted), so a plain
  * deterministic string matcher is the faithful analogue.
  */
object RkText {

  /** katakana syllable → accepted romaji renderings (Hepburn + kunrei). */
  private val mono: Map[Char, Seq[String]] = Map(
    'ア' -> Seq("a"), 'イ' -> Seq("i"), 'ウ' -> Seq("u"), 'エ' -> Seq("e"), 'オ' -> Seq("o"),
    'カ' -> Seq("ka"), 'キ' -> Seq("ki"), 'ク' -> Seq("ku"), 'ケ' -> Seq("ke"), 'コ' -> Seq("ko"),
    'サ' -> Seq("sa"), 'シ' -> Seq("shi", "si"), 'ス' -> Seq("su"), 'セ' -> Seq("se"), 'ソ' -> Seq("so"),
    'タ' -> Seq("ta"), 'チ' -> Seq("chi", "ti"), 'ツ' -> Seq("tsu", "tu"), 'テ' -> Seq("te"), 'ト' -> Seq("to"),
    'ナ' -> Seq("na"), 'ニ' -> Seq("ni"), 'ヌ' -> Seq("nu"), 'ネ' -> Seq("ne"), 'ノ' -> Seq("no"),
    'ハ' -> Seq("ha"), 'ヒ' -> Seq("hi"), 'フ' -> Seq("fu", "hu"), 'ヘ' -> Seq("he"), 'ホ' -> Seq("ho"),
    'マ' -> Seq("ma"), 'ミ' -> Seq("mi"), 'ム' -> Seq("mu"), 'メ' -> Seq("me"), 'モ' -> Seq("mo"),
    'ヤ' -> Seq("ya"), 'ユ' -> Seq("yu"), 'ヨ' -> Seq("yo"),
    'ラ' -> Seq("ra"), 'リ' -> Seq("ri"), 'ル' -> Seq("ru"), 'レ' -> Seq("re"), 'ロ' -> Seq("ro"),
    'ワ' -> Seq("wa"), 'ヲ' -> Seq("wo", "o"), 'ン' -> Seq("n", "nn"),
    'ガ' -> Seq("ga"), 'ギ' -> Seq("gi"), 'グ' -> Seq("gu"), 'ゲ' -> Seq("ge"), 'ゴ' -> Seq("go"),
    'ザ' -> Seq("za"), 'ジ' -> Seq("ji", "zi"), 'ズ' -> Seq("zu"), 'ゼ' -> Seq("ze"), 'ゾ' -> Seq("zo"),
    'ダ' -> Seq("da"), 'ヂ' -> Seq("ji", "di"), 'ヅ' -> Seq("zu", "du"), 'デ' -> Seq("de"), 'ド' -> Seq("do"),
    'バ' -> Seq("ba"), 'ビ' -> Seq("bi"), 'ブ' -> Seq("bu"), 'ベ' -> Seq("be"), 'ボ' -> Seq("bo"),
    'パ' -> Seq("pa"), 'ピ' -> Seq("pi"), 'プ' -> Seq("pu"), 'ペ' -> Seq("pe"), 'ポ' -> Seq("po"),
    'ヴ' -> Seq("vu"),
    'ァ' -> Seq("a", "xa", "la"), 'ィ' -> Seq("i", "xi", "li"),
    'ゥ' -> Seq("u", "xu", "lu"), 'ェ' -> Seq("e", "xe", "le"), 'ォ' -> Seq("o", "xo", "lo"),
    'ー' -> Seq("-"))

  /** consonant+glide digraphs (e.g. キャ → kya). */
  private val di: Map[String, Seq[String]] = {
    def g(c: Char, roms: Seq[String]): Seq[(String, Seq[String])] =
      Seq("ャ" -> "a", "ュ" -> "u", "ョ" -> "o").map { case (small, v) =>
        (s"$c$small", roms.map(_ + v))
      }
    (g('キ', Seq("ky")) ++ g('ギ', Seq("gy")) ++ g('ニ', Seq("ny")) ++
      g('ヒ', Seq("hy")) ++ g('ビ', Seq("by")) ++ g('ピ', Seq("py")) ++
      g('ミ', Seq("my")) ++ g('リ', Seq("ry")) ++
      Seq(
        "シャ" -> Seq("sha", "sya"), "シュ" -> Seq("shu", "syu"), "ショ" -> Seq("sho", "syo"),
        "チャ" -> Seq("cha", "tya"), "チュ" -> Seq("chu", "tyu"), "チョ" -> Seq("cho", "tyo"),
        "ジャ" -> Seq("ja", "zya", "jya"), "ジュ" -> Seq("ju", "zyu", "jyu"),
        "ジョ" -> Seq("jo", "zyo", "jyo"))).toMap
  }

  private def isHiragana(c: Char): Boolean = c >= 0x3041 && c <= 0x3096
  private def isKatakana(c: Char): Boolean = (c >= 0x30a1 && c <= 0x30fa) || c == 'ー'

  /** hiragana → katakana codepoint shift; other chars unchanged. */
  def toKatakana(s: String): String =
    s.map(c => if (isHiragana(c)) (c + 0x60).toChar else c)

  /** romaji renderings of the katakana syllable starting at `i`:
    * (consumed-kana-length, accepted romaji strings).
    */
  private def syllablesAt(key: String, i: Int): Seq[(Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    if (i + 1 < key.length)
      di.get(key.substring(i, i + 2)).foreach(_.foreach(r => out += ((2, r))))
    if (key.charAt(i) == 'ッ' && i + 1 < key.length) {
      // sokuon doubles the following consonant (ッタ → "tta")
      syllablesAt(key, i + 1).foreach { case (len, r) =>
        if (r.nonEmpty) out += ((1 + len, s"${r.head}$r"))
      }
      out += ((1, "xtu")); out += ((1, "ltu"))
    } else mono.get(key.charAt(i)).foreach(_.foreach(r => out += ((1, r))))
    out.toSeq
  }

  /** Does ascii `q` prefix-match some romanization of katakana `key`? */
  private def romajiPrefix(key: String, ki: Int, q: String): Boolean = {
    if (q.isEmpty) return true
    if (ki >= key.length) return false
    syllablesAt(key, ki).exists { case (len, rom) =>
      if (q.length <= rom.length) rom.startsWith(q)
      else q.startsWith(rom) && romajiPrefix(key, ki + len, q.substring(rom.length))
    }
  }

  /** prefix_rk_search predicate: `query` (romaji / hiragana / katakana)
    * prefix-matches the reading of `key` (katakana, possibly mixed).
    */
  def prefixRkMatch(key0: String, query0: String): Boolean = {
    if (key0 == null || query0 == null) return false
    val query = query0.trim
    if (query.isEmpty) return true
    val key = toKatakana(key0)
    val q = toKatakana(query)
    // leading kana run matches the key verbatim; an ascii TAIL continues
    // as a romaji prefix of the remaining syllables (mixed queries like
    // さｋ → サ + romaji "k", reference GRN_CURSOR_RK)
    val kanaLen = q.takeWhile(isKatakana).length
    if (kanaLen == 0) romajiPrefix(key, 0, q.toLowerCase)
    else {
      val tail = q.substring(kanaLen)
      if (tail.exists(isKatakana)) key.startsWith(q) // kana after ascii: literal
      else key.startsWith(q.substring(0, kanaLen)) &&
        (tail.isEmpty || romajiPrefix(key, kanaLen, tail.toLowerCase))
    }
  }
}
