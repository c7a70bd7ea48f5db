package graft.functions

import graft.analysis.{GTokenizer, TokenizeMode, Tokenizers}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions of the reference's proc surface re-expressed as
  * Spark columns: snippet (KWIC extraction, reference lib/snip.c:368-585 +
  * proc_snippet.c:234), highlight_html (proc_highlight.c:488), html_untag
  * (proc.c:3460). Keyword location uses the same analysis chain as the
  * index (normalized-offset mapping back into the original text via the
  * tokenizer's startOff/endOff checks, the lib/string.c "checks" analogue).
  */
object TextFunctions {

  /** Keyword occurrence spans as original-text char ranges, located on the
    * NORMALIZED text and mapped back through the per-codepoint offsets
    * (the reference's "checks" mechanism, lib/string.c — this is what lets
    * keyword "MySQL" tag the full-width `ＭｙＳＱＬ` in the original).
    * Returns (startChar, endCharExclusive, keywordIdx) sorted, overlaps
    * dropped (leftmost wins).
    */
  def keywordSpans(
      text: String,
      keywords: Seq[String],
      normalize: Boolean
  ): Seq[(Int, Int, Int)] = {
    if (text == null || text.isEmpty) return Seq.empty
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    if (!normalize) {
      // no normalizer = exact byte match (reference: a keywords table with
      // no normalizer set, func_highlight_create_keywords_table)
      keywords.zipWithIndex.foreach { case (k, g) =>
        if (k.nonEmpty) {
          var idx = text.indexOf(k)
          while (idx >= 0) { spans += ((idx, idx + k.length, g)); idx = text.indexOf(k, idx + 1) }
        }
      }
    } else {
      val nz = graft.analysis.Normalizer.auto(text)
      val ntext = nz.text
      // char index per normalized codepoint (ntext may contain surrogates)
      val nChar2cp = new Array[Int](ntext.length + 1)
      var ci = 0; var cpi = 0
      while (ci < ntext.length) {
        nChar2cp(ci) = cpi
        val w = Character.charCount(ntext.codePointAt(ci))
        if (w == 2) nChar2cp(ci + 1) = cpi
        ci += w; cpi += 1
      }
      nChar2cp(ntext.length) = cpi
      // original codepoint index -> original char index
      val nOrig = text.codePointCount(0, text.length)
      val cp2char = new Array[Int](nOrig + 1)
      ci = 0; cpi = 0
      while (ci < text.length) {
        cp2char(cpi) = ci
        ci += Character.charCount(text.codePointAt(ci)); cpi += 1
      }
      cp2char(cpi) = text.length
      keywords.zipWithIndex.foreach { case (k0, g) =>
        val k = graft.analysis.Normalizer.auto(k0).text
        if (k.nonEmpty) {
          var idx = ntext.indexOf(k)
          while (idx >= 0) {
            val a = nChar2cp(idx) // normalized cp span [a, b)
            val b = nChar2cp(idx + k.length)
            if (b > a && b <= nz.length) {
              val startCp = nz.offsets(a)
              val endCp = nz.endOffsets(b - 1)
              spans += ((cp2char(startCp), cp2char(endCp), g))
            }
            idx = ntext.indexOf(k, idx + 1)
          }
        }
      }
    }
    val sorted = spans.sortBy(s => (s._1, -(s._2 - s._1)))
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    var pos = 0
    sorted.foreach { case s @ (a, b, _) =>
      if (a >= pos) { out += s; pos = b }
    }
    out.toSeq
  }

  /** HTML escape of text outside/inside highlight tags (reference
    * grn_text_escape usage in proc_highlight.c).
    */
  def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** `highlight_full` / `highlight` engine: tag each keyword group's
    * occurrences with its own open/close tags (reference
    * proc_highlight.c:340-488); `escape` HTML-escapes all emitted text
    * content (tags excluded), `normalize` locates matches on the
    * normalized text.
    */
  def highlightOf(
      text: String,
      groups: Seq[(String, String, String)],
      escape: Boolean,
      normalize: Boolean
  ): String = {
    if (text == null) return null
    val spans = keywordSpans(text, groups.map(_._1), normalize)
    val sb = new StringBuilder
    var pos = 0
    def emit(s: String): Unit = sb.append(if (escape) htmlEscape(s) else s)
    spans.foreach { case (a, b, g) =>
      emit(text.substring(pos, a))
      sb.append(groups(g)._2)
      emit(text.substring(a, b))
      sb.append(groups(g)._3)
      pos = b
    }
    emit(text.substring(pos))
    sb.toString
  }

  /** Per-keyword occurrence spans as original-text CHAR ranges located on
    * the normalized text, with removed characters (blanks the normalizer
    * drops) attributed to the FOLLOWING kept character — the reference's
    * "checks" accumulation (lib/string.c), which is why a keyword match in
    * the snippet engine covers its preceding stripped space and
    * GRN_SNIP_SKIP_LEADING_SPACES exists to trim it back off.
    */
  private def snipOccurrences(
      text: String, keyword: String, normalize: Boolean): Seq[(Int, Int)] = {
    if (keyword.isEmpty) return Seq.empty
    val occ = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    if (!normalize) {
      var idx = text.indexOf(keyword)
      while (idx >= 0) { occ += ((idx, idx + keyword.length)); idx = text.indexOf(keyword, idx + 1) }
      return occ.toSeq
    }
    val nz = graft.analysis.Normalizer.auto(text)
    val ntext = nz.text
    val k = graft.analysis.Normalizer.auto(keyword).text
    if (k.isEmpty) return Seq.empty
    // normalized char index -> normalized codepoint index
    val nChar2cp = new Array[Int](ntext.length + 1)
    var ci = 0; var cpi = 0
    while (ci < ntext.length) {
      nChar2cp(ci) = cpi
      val w = Character.charCount(ntext.codePointAt(ci))
      if (w == 2) nChar2cp(ci + 1) = cpi
      ci += w; cpi += 1
    }
    nChar2cp(ntext.length) = cpi
    // original codepoint index -> original char index
    val nOrig = text.codePointCount(0, text.length)
    val cp2char = new Array[Int](nOrig + 1)
    ci = 0; cpi = 0
    while (ci < text.length) {
      cp2char(cpi) = ci
      ci += Character.charCount(text.codePointAt(ci)); cpi += 1
    }
    cp2char(cpi) = text.length
    var idx = ntext.indexOf(k)
    while (idx >= 0) {
      val a = nChar2cp(idx)
      val b = nChar2cp(idx + k.length)
      if (b > a && b <= nz.length) {
        val startCp =
          if (a == 0) 0 else math.min(nz.offsets(a), nz.endOffsets(a - 1))
        val endCp = nz.endOffsets(b - 1)
        occ += ((cp2char(startCp), cp2char(endCp)))
      }
      idx = ntext.indexOf(k, idx + 1)
    }
    occ.toSeq
  }

  /** Faithful port of the reference snippet window engine (grn_snip_exec,
    * lib/snip.c:608-745): greedy tag collection per window (min-start
    * condition first; occurrences crossing the window boundary skipped),
    * window re-centering `max(min((start+lastEnd-width)/2, len-width),
    * prevWindowEnd)`, at most `maxResults` windows of `width` BYTES each,
    * boundaries aligned to UTF-8 character starts
    * (grn_snip_find_firstbyte). The first-tag keyword-balancing heuristic
    * (skip an already-found keyword when the remaining windows are needed
    * for unfound ones, snip.c:643-655) is included.
    */
  def snipExec(
      text: String,
      groups: Seq[(String, String, String)],
      width: Int = 200,
      maxResults: Int = 3,
      escape: Boolean = false,
      normalize: Boolean = true,
      skipLeadingSpaces: Boolean = true,
      prefix: String = "",
      suffix: String = ""
  ): Seq[String] = {
    if (text == null || text.isEmpty || groups.isEmpty) return Seq.empty
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val len = bytes.length
    // original char index -> byte offset
    val char2byte = new Array[Int](text.length + 1)
    var ci = 0; var bo = 0
    while (ci < text.length) {
      char2byte(ci) = bo
      val cp = text.codePointAt(ci)
      val w = Character.charCount(cp)
      if (w == 2) char2byte(ci + 1) = bo
      bo += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
      ci += w
    }
    char2byte(text.length) = len
    def isCharStart(p: Int): Boolean = p >= len || (bytes(p) & 0xc0) != 0x80
    def alignFwd(p0: Int): Int = { var p = p0; while (!isCharStart(p)) p += 1; p }
    def alignBack(p0: Int): Int = { var p = p0; while (p > 0 && !isCharStart(p)) p -= 1; p }

    // per-condition occurrence lists in byte offsets
    val occs: Array[Array[(Int, Int)]] = groups.map { g =>
      snipOccurrences(text, g._1, normalize).map { case (a0, b) =>
        var a = a0
        if (skipLeadingSpaces) {
          while (a < b && {
            val cp = text.codePointAt(a)
            Character.isWhitespace(cp) || Character.getType(cp) == Character.SPACE_SEPARATOR
          }) a += Character.charCount(text.codePointAt(a))
        }
        (char2byte(a), char2byte(b))
      }.filter(p => p._2 > p._1).toArray
    }.toArray
    val n = groups.size
    val cur = new Array[Int](n)
    val across = new Array[Boolean](n)
    val count = new Array[Int](n)
    var unfound = n
    def hasCur(i: Int): Boolean = cur(i) < occs(i).length

    val out = scala.collection.mutable.ArrayBuffer[String]()
    var lastLastEnd = 0
    var done = false
    while (!done && out.size < maxResults) {
      val tags = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
      var windowStart = 0
      var lastEnd = 0
      var lastTagEnd = 0
      var collecting = true
      while (collecting) {
        // condition with minimum start offset (tie: maximum end offset)
        var pick = -1
        var i = 0
        while (i < n) {
          if (!across(i) && hasCur(i)) {
            if (pick < 0) pick = i
            else {
              val (ps, pe) = occs(pick)(cur(pick))
              val (s, e) = occs(i)(cur(i))
              if (s < ps || (s == ps && e > pe)) pick = i
            }
          }
          i += 1
        }
        if (pick < 0) collecting = false
        else {
          val (s, e) = occs(pick)(cur(pick))
          var handled = false
          if (tags.isEmpty) {
            // keyword-balancing: save the remaining windows for unfound
            // keywords (snip.c:643-655)
            if (maxResults - out.size <= unfound && count(pick) > 0) {
              var exclude = true
              var j = 0
              while (j < n) {
                if (j != pick && hasCur(j) && count(j) == 0 &&
                    occs(j)(cur(j))._2 <= s + width) exclude = false
                j += 1
              }
              if (exclude) { cur(pick) += 1; handled = true }
            }
            if (!handled) windowStart = s
          } else {
            if (s >= windowStart + width) { collecting = false; handled = true }
            else if (s < lastTagEnd) { cur(pick) += 1; handled = true }
          }
          if (!handled) {
            if (e > windowStart + width) { across(pick) = true; cur(pick) += 1 }
            else {
              if (count(pick) == 0) unfound -= 1
              count(pick) += 1
              tags += ((s, e, pick))
              lastEnd = e; lastTagEnd = e
              cur(pick) += 1
            }
          }
        }
      }
      if (tags.isEmpty) done = true
      else {
        var ws =
          if (windowStart + lastEnd < width) 0
          else math.max(math.min((windowStart + lastEnd - width) / 2, len - width), lastLastEnd)
        if (ws < 0) ws = 0
        ws = alignFwd(ws)
        var we = ws + width
        if (we < len) we = alignBack(we) else we = len
        lastLastEnd = we
        val sb = new StringBuilder(prefix)
        def str(from: Int, until: Int): String =
          new String(bytes, from, until - from, java.nio.charset.StandardCharsets.UTF_8)
        def emit(s: String): Unit = sb.append(if (escape) htmlEscape(s) else s)
        var pos = ws
        tags.foreach { case (a, b, g) =>
          if (a >= pos && b <= we) {
            emit(str(pos, a))
            sb.append(groups(g)._2)
            emit(str(a, b))
            sb.append(groups(g)._3)
            pos = b
          }
        }
        emit(str(pos, we))
        sb.append(suffix)
        out += sb.toString
        java.util.Arrays.fill(across, false)
      }
    }
    out.toSeq
  }

  /** `snippet` engine with per-group tags + normalizer-located matches
    * (reference proc_snippet.c:234).
    */
  def snippetTagged(
      text: String,
      groups: Seq[(String, String, String)],
      width: Int,
      maxResults: Int,
      escape: Boolean,
      normalize: Boolean,
      skipLeadingSpaces: Boolean = true,
      prefix: String = "",
      suffix: String = ""
  ): Seq[String] =
    snipExec(text, groups, width, maxResults, escape, normalize,
      skipLeadingSpaces, prefix, suffix)

  /** `snippet_html`-style snippet: window engine with one tag set and HTML
    * escaping on (reference GRN_SNIP_MAPPING_HTML_ESCAPE).
    */
  def snippetOf(
      text: String,
      keywords: Seq[String],
      width: Int,
      maxResults: Int,
      openTag: String,
      closeTag: String
  ): Seq[String] =
    snipExec(text, keywords.filter(_.nonEmpty).map(k => (k, openTag, closeTag)),
      width, maxResults, escape = true, normalize = true)

  /** `snippet_html(col)` with the query keywords known at plan time.
    * NULL (not an empty vector) when no snippet is produced — the
    * reference envelope (proc_snippet.c emits null when grn_snip finds
    * nothing), and what the grntest fixtures assert.
    */
  def snippetHtml(c: Column, keywords: Seq[String], width: Int = 200, maxResults: Int = 3): Column = {
    val kw = keywords
    val u = udf { (text: String) =>
      val r = snippetOf(text, kw, width, maxResults,
        "<span class=\"keyword\">", "</span>")
      if (r.isEmpty) null else r
    }
    u(c)
  }

  /** `highlight_html(col)` scalar: tag query keywords over the whole text,
    * HTML-escaping everything outside the inserted tags (reference
    * func_highlight_html, proc_highlight.c:437: use_html_escape always
    * true, matches located through NormalizerAuto).
    */
  def highlightHtmlOf(text: String, kw: Seq[String]): String = {
    if (text == null) return null
    highlightOf(text,
      kw.filter(_.nonEmpty).map(k => (k, "<span class=\"keyword\">", "</span>")),
      escape = true, normalize = true)
  }

  /** `highlight_html(col)`: tag all keyword occurrences in the whole text. */
  def highlightHtml(c: Column, keywords: Seq[String]): Column = {
    val kw = keywords
    val u = udf { (text: String) =>
      if (text == null) null
      else {
        highlightHtmlOf(text, kw)
      }
    }
    u(c)
  }

  /** `tokenize` command as a column: the token-text array of the analysis
    * chain (reference lib/proc.c:2475) — use with `explode` for the
    * table-valued form.
    */
  def tokenize(c: Column, tokenizerName: String, mode: String = "ADD"): Column = {
    val tn = tokenizerName
    val md = mode
    val u = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else Tokenizers.byName(tn)
        .tokenize(text, if (md == "GET") TokenizeMode.Get else TokenizeMode.Add)
        .map(_.term)
    }
    u(c)
  }

  /** Geo distance in meters between two WGS84 (lat, lon) degree pairs —
    * haversine sphere, the `geo_distance(..., "sphere")` variant
    * (reference lib/geo.c:2497).
    */
  def geoDistance(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = lit(6371009.0)
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    r * lit(2.0) * asin(sqrt(a))
  }

  /** `geo_in_rectangle(p, topLeft, bottomRight)` predicate. */
  def geoInRectangle(lat: Column, lon: Column,
      topLat: Double, leftLon: Double, bottomLat: Double, rightLon: Double): Column =
    lat <= topLat && lat >= bottomLat && lon >= leftLon && lon <= rightLon

  /** `geo_in_circle(p, center, radiusMeters)`: bounding-box prefilter (the
    * geo-grid cursor analogue, sargable) AND exact haversine check.
    */
  def geoInCircle(lat: Column, lon: Column, cLat: Double, cLon: Double, radiusM: Double): Column = {
    val dLat = radiusM / 111320.0
    val dLon = radiusM / (111320.0 * math.max(0.01, math.cos(math.toRadians(cLat))))
    val bbox = lat.between(cLat - dLat, cLat + dLat) && lon.between(cLon - dLon, cLon + dLon)
    bbox && geoDistance(lat, lon, lit(cLat), lit(cLon)) <= radiusM
  }
}
