package graft.analysis

/** Token filters (reference plugins/token_filters/stem.c:266 and
  * stop_word.c:146): applied after tokenization, in both ADD (build) and
  * GET (query) modes so index and query agree.
  *
  * The stemmer is the classic Porter algorithm (public, Porter 1980) — the
  * reference delegates to libstemmer's "english" which is Porter2; for the
  * ASCII/code payload the difference is immaterial and our build/query
  * sides agree with each other, which is the invariant that matters.
  */
object TokenFilters {

  /** TokenFilterStopWord: drop tokens in the stop set (the reference skips
    * them at search time via the lexicon's is_stop_word column; we apply
    * symmetrically at build+query).
    */
  def stopWord(stops: Set[String])(toks: Vector[Token]): Vector[Token] =
    toks.filterNot(t => stops.contains(t.term))

  /** TokenFilterStem: Porter-stem each token's term. Reference semantics
    * (plugins/token_filters/stem.c is_stemmable/unfold): only terms of
    * ASCII alpha/digit/'-'/'\'' stem; an ALL-UPPER term stems through its
    * lowercase form and folds back to upper; trailing possessive
    * apostrophes strip first (libstemmer english step 0).
    */
  def stem(toks: Vector[Token]): Vector[Token] = toks.map { t =>
    val term = t.term
    var hasLower = false; var hasUpper = false
    var stemmable = term.nonEmpty
    term.foreach { c =>
      if (c >= 'a' && c <= 'z') hasLower = true
      else if (c >= 'A' && c <= 'Z') hasUpper = true
      else if ((c >= '0' && c <= '9') || c == '-' || c == '\'') ()
      else stemmable = false
    }
    def step0(w: String): String =
      if (w.endsWith("'s'")) w.dropRight(3)
      else if (w.endsWith("'s")) w.dropRight(2)
      else if (w.endsWith("'")) w.dropRight(1)
      else w
    if (!stemmable) t
    else if (hasUpper && !hasLower)
      t.copy(term = PorterStemmer.stem(step0(term.toLowerCase)).toUpperCase)
    else t.copy(term = PorterStemmer.stem(step0(term)))
  }
}

/** Compact Porter stemmer (M.F. Porter, 1980, public algorithm). Operates
  * only on lowercase ASCII words; anything else passes through unchanged.
  */
object PorterStemmer {

  private def isV(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isV(w, i - 1)
    case _ => false
  }

  /** measure m of the stem: number of VC sequences. */
  private def m(w: String): Int = {
    var i = 0
    val n = w.length
    var count = 0
    while (i < n && !isV(w, i)) i += 1
    while (i < n) {
      while (i < n && isV(w, i)) i += 1
      if (i < n) { count += 1; while (i < n && !isV(w, i)) i += 1 }
    }
    count
  }

  private def hasVowel(w: String): Boolean = (0 until w.length).exists(isV(w, _))

  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isV(w, w.length - 1)

  /** *o: stem ends cvc where final c is not w, x, y. */
  private def cvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isV(w, n - 3) && isV(w, n - 2) && !isV(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  def stem(word: String): String = {
    if (word.length <= 2 || !word.forall(c => c >= 'a' && c <= 'z')) return word
    var w = word

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    var extra1b = false
    if (w.endsWith("eed")) { if (m(w.dropRight(3)) > 0) w = w.dropRight(1) }
    else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) { w = w.dropRight(2); extra1b = true }
    else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) { w = w.dropRight(3); extra1b = true }
    if (extra1b) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (m(w) == 1 && cvc(w)) w += "e"
    }

    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // step 2 (m > 0 suffix mappings)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.collectFirst { case (s, r) if w.endsWith(s) && m(w.dropRight(s.length)) > 0 => (s, r) }
      .foreach { case (s, r) => w = w.dropRight(s.length) + r }

    // step 3
    val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.collectFirst { case (s, r) if w.endsWith(s) && m(w.dropRight(s.length)) > 0 => (s, r) }
      .foreach { case (s, r) => w = w.dropRight(s.length) + r }

    // step 4 (m > 1 suffix removal)
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    val s4 = step4.find(s => w.endsWith(s) && m(w.dropRight(s.length)) > 1)
    s4 match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (w.endsWith("ion") && w.length > 3 &&
          "st".contains(w.charAt(w.length - 4)) && m(w.dropRight(3)) > 1)
          w = w.dropRight(3)
    }

    // step 5a
    if (w.endsWith("e")) {
      val st = w.dropRight(1)
      if (m(st) > 1 || (m(st) == 1 && !cvc(st))) w = st
    }
    // step 5b
    if (m(w) > 1 && endsDoubleC(w) && w.endsWith("l")) w = w.dropRight(1)

    w
  }
}

/** A tokenizer with token filters appended; registered through
  * [[Tokenizers.byName]] with the `Base+Stem` naming convention so the
  * manifest round-trips the full analysis chain as one string.
  *
  * `getFilters` run only in GET (query) mode — the stop-word filter skips
  * query tokens but leaves indexed postings intact (reference
  * plugins/token_filters/stop_word.c checks the cursor mode).
  */
final class FilteredTokenizer(
    base: GTokenizer,
    filters: Seq[Vector[Token] => Vector[Token]],
    getFilters: Seq[Vector[Token] => Vector[Token]] = Nil)
  extends GTokenizer {
  def normalizer: String => Normalized = base.normalizer
  def tokenizeNormalized(n: Normalized, mode: TokenizeMode): Vector[Token] = {
    val ts = filters.foldLeft(base.tokenizeNormalized(n, mode))((ts, f) => f(ts))
    if (mode == TokenizeMode.Get) getFilters.foldLeft(ts)((ts, f) => f(ts))
    else ts
  }
}
