package graft.functions

import org.apache.spark.sql.SparkSession

/** Scalar functions from the reference's proc registry (lib/proc.c:5126+)
  * that script-syntax filters can call, registered as session UDFs.
  */
object GrnScalars {

  /** Levenshtein distance (reference edit_distance,
    * lib/proc/proc_fuzzy_search.c:94).
    */
  def editDistance(a0: String, b0: String): Int = {
    val a = if (a0 == null) "" else a0
    val b = if (b0 == null) "" else b0
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Damerau–Levenshtein (optimal string alignment): Levenshtein plus
    * adjacent-transposition as one edit — the `with_transposition` option
    * of fuzzy_search (reference lib/proc/proc_fuzzy_search.c:94 cost loop,
    * transposition branch).
    */
  def damerauDistance(a0: String, b0: String): Int = {
    val a = if (a0 == null) "" else a0
    val b = if (b0 == null) "" else b0
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val d = Array.ofDim[Int](n + 1, m + 1)
    var i = 0
    while (i <= n) { d(i)(0) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j) = j; j += 1 }
    i = 1
    while (i <= n) {
      j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var v = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
            a.charAt(i - 2) == b.charAt(j - 1))
          v = math.min(v, d(i - 2)(j - 2) + 1)
        d(i)(j) = v
        j += 1
      }
      i += 1
    }
    d(n)(m)
  }

  def htmlUntag(s: String): String =
    if (s == null) null else s.replaceAll("<[^>]*>", "")

  def register(spark: SparkSession): Unit = {
    spark.udf.register("edit_distance", (a: String, b: String) => editDistance(a, b))
    spark.udf.register("html_untag", (s: String) => htmlUntag(s))
    // fuzzy_search as a sequential predicate: value within max_distance 1
    // (reference proc_fuzzy_search defaults; int result so `> 0` typechecks)
    spark.udf.register("fuzzy_search",
      (v: String, q: String) => if (v != null && editDistance(v, q) <= 1) 1 else 0)
    spark.udf.register("string_length", (s: String) => if (s == null) 0 else s.codePointCount(0, s.length))
    spark.udf.register("damerau_levenshtein",
      (a: String, b: String) => damerauDistance(a, b))
    // the tokenize command for SQL (reference lib/proc.c:2475): the
    // analysis chain's token texts; pair with LATERAL VIEW explode for
    // the table form. Mode ADD = index-side, GET = query-side.
    spark.udf.register("grn_tokenize",
      (text: String, tokenizer: String, mode: String) => {
        if (text == null) null
        else {
          val md =
            if (mode != null && mode.equalsIgnoreCase("GET"))
              graft.analysis.TokenizeMode.Get
            else graft.analysis.TokenizeMode.Add
          graft.analysis.Tokenizers.byName(tokenizer).tokenize(text, md)
            .map(_.term)
        }
      })
    // snippet/highlight with EXPLICIT keywords (CSV) for plain SQL use —
    // the select command's output-column forms still pull keywords from
    // the query condition (reference proc_snippet.c); these cover ad-hoc
    // SQL where no condition context exists
    spark.udf.register("snippet_html",
      (text: String, keywordsCsv: String) => {
        val kw = Option(keywordsCsv).toSeq
          .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        val r = TextFunctions.snippetOf(text, kw, 200, 3,
          "<span class=\"keyword\">", "</span>")
        if (r.isEmpty) null else r
      })
    spark.udf.register("highlight_html",
      (text: String, keywordsCsv: String) => {
        val kw = Option(keywordsCsv).toSeq
          .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        TextFunctions.highlightHtmlOf(text, kw)
      })
    spark.udf.register("prefix_rk_search",
      (k: String, q: String) => RkText.prefixRkMatch(k, q))
  }
}
