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
      val lower = text.toLowerCase
      keywords.zipWithIndex.foreach { case (k0, g) =>
        val k = k0.toLowerCase
        if (k.nonEmpty) {
          var idx = lower.indexOf(k)
          while (idx >= 0) { spans += ((idx, idx + k.length, g)); idx = lower.indexOf(k, idx + 1) }
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
              val endCp = nz.offsets(b - 1) + 1
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

  /** `snippet` engine with per-group tags + normalizer-located matches
    * (reference proc_snippet.c:234): windows of `width` chars, at most
    * `maxResults`, every in-window occurrence tagged.
    */
  def snippetTagged(
      text: String,
      groups: Seq[(String, String, String)],
      width: Int,
      maxResults: Int,
      escape: Boolean,
      normalize: Boolean
  ): Seq[String] = {
    if (text == null) return Seq.empty
    val spans = keywordSpans(text, groups.map(_._1), normalize)
    if (spans.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var consumedTo = 0
    var i = 0
    while (i < spans.length && out.size < maxResults) {
      val (s0, _, _) = spans(i)
      if (s0 >= consumedTo) {
        val wStart = math.max(0, math.min(s0 - (width / 4), text.length))
        val wEnd = math.min(text.length, wStart + width)
        val sb = new StringBuilder
        var pos = wStart
        def emit(s: String): Unit = sb.append(if (escape) htmlEscape(s) else s)
        spans.foreach { case (a, b, g) =>
          if (a >= wStart && b <= wEnd && a >= pos) {
            emit(text.substring(pos, a))
            sb.append(groups(g)._2)
            emit(text.substring(a, b))
            sb.append(groups(g)._3)
            pos = b
          }
        }
        emit(text.substring(pos, wEnd))
        out += sb.toString
        consumedTo = wEnd
      }
      i += 1
    }
    out.toSeq
  }

  /** Pure snippet engine: windows of `width` codepoints around keyword
    * occurrences, at most `maxResults` windows, keywords wrapped in
    * openTag/closeTag. Keywords match case-insensitively on the normalized
    * text (NormalizerAuto semantics).
    */
  def snippetOf(
      text: String,
      keywords: Seq[String],
      width: Int,
      maxResults: Int,
      openTag: String,
      closeTag: String
  ): Seq[String] = {
    if (text == null || keywords.isEmpty) return Seq.empty
    val lower = text.toLowerCase
    val kws = keywords.map(_.toLowerCase).filter(_.nonEmpty)
    // all occurrence spans, in order
    val occs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    kws.foreach { k =>
      var from = 0
      var idx = lower.indexOf(k, from)
      while (idx >= 0) {
        occs += ((idx, idx + k.length))
        idx = lower.indexOf(k, idx + 1)
      }
    }
    if (occs.isEmpty) return Seq.empty
    val sorted = occs.sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var consumedTo = 0
    var i = 0
    while (i < sorted.length && out.size < maxResults) {
      val (s0, _) = sorted(i)
      if (s0 >= consumedTo) {
        val wStart = math.max(0, math.min(s0 - (width / 4), text.length))
        val wEnd = math.min(text.length, wStart + width)
        // tag every occurrence inside the window, left to right
        val sb = new StringBuilder
        var pos = wStart
        sorted.foreach { case (a, b) =>
          if (a >= wStart && b <= wEnd && a >= pos) {
            sb.append(text.substring(pos, a))
            sb.append(openTag).append(text.substring(a, b)).append(closeTag)
            pos = b
          }
        }
        sb.append(text.substring(pos, wEnd))
        out += sb.toString
        consumedTo = wEnd
      }
      i += 1
    }
    out.toSeq
  }

  /** `snippet_html(col)` with the query keywords known at plan time. */
  def snippetHtml(c: Column, keywords: Seq[String], width: Int = 200, maxResults: Int = 3): Column = {
    val kw = keywords
    val u = udf { (text: String) =>
      snippetOf(text, kw, width, maxResults, "<span class=\"keyword\">", "</span>")
    }
    u(c)
  }

  /** Plain-function highlight (UDF-registrable): tag all keyword
    * occurrences (case-insensitive find, original text preserved).
    */
  def highlightHtmlOf(text: String, kw: Seq[String]): String = {
    if (text == null) return null
    val lower = text.toLowerCase
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    kw.map(_.toLowerCase).filter(_.nonEmpty).foreach { k =>
      var idx = lower.indexOf(k)
      while (idx >= 0) { spans += ((idx, idx + k.length)); idx = lower.indexOf(k, idx + 1) }
    }
    val sb = new StringBuilder
    var pos = 0
    spans.sortBy(_._1).foreach { case (a, b) =>
      if (a >= pos) {
        sb.append(text.substring(pos, a))
        sb.append("<span class=\"keyword\">").append(text.substring(a, b)).append("</span>")
        pos = b
      }
    }
    sb.append(text.substring(pos))
    sb.toString
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
