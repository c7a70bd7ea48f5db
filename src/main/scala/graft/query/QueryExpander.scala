package graft.query

import org.apache.spark.sql.DataFrame

/** `--query_expander`: synonym substitution over the raw query string,
  * applied BEFORE parsing (reference grn_expr_syntax_expand_query,
  * lib/expr.c:7804-7917, wired into select at proc_select.c:34-58; the
  * TSV file form is plugins/query_expanders/tsv.c). Each bare term or
  * quoted phrase whose (normalized) text is a key of the synonym
  * dictionary is replaced by that key's expansion — itself query syntax,
  * so one term can expand to `((a) OR (b))`. Not recursive.
  *
  * Scale shape: a synonym dictionary is a small curated table (the
  * reference holds it as an in-memory key table); expansion is a pure
  * string rewrite on the DRIVER, O(|query|) with map lookups — no job, no
  * broadcast needed. [[fromTable]] collects the dictionary once per
  * expander; for a 10⁶-row dictionary that is a few MB of driver memory,
  * the same order the reference's mmap'd table occupies per process.
  *
  * @param synonyms normalized key → replacement query text
  * @param keyOf    lookup normalizer (the expansion TABLE's normalizer in
  *                 the reference — e.g. NormalizerAuto lowercasing); keys
  *                 of `synonyms` must already be in normalized form
  */
final case class QueryExpander(
    synonyms: Map[String, String],
    keyOf: String => String = identity) {
  def expand(q: String): String = QueryExpander.expandTerms(q, synonyms, keyOf)

  /** Flag-aware form: the reference scanner gates the `col:op` prefix on
    * GRN_EXPR_ALLOW_COLUMN (grn_expr_syntax_expand_query_terms checks the
    * expression flags), so with `--query_flags NONE` a term like `syn:foo`
    * is ONE literal term and expands as such.
    */
  def expand(q: String, flags: QueryParser.QueryFlags): String =
    QueryExpander.expandTerms(q, synonyms, keyOf, flags.allowColumn)
}

object QueryExpander {

  /** Vector synonym values OR their elements: n>1 renders as
    * `((a) OR (b))`, a single element splices bare, empty splices nothing
    * (reference grn_expr_syntax_expand_term_by_column, lib/expr.c:7758).
    */
  def orJoin(els: Seq[String]): String = els match {
    case Seq() => ""
    case Seq(one) => one
    case many => many.mkString("((", ") OR (", "))")
  }

  /** query_expanders/tsv synonyms file (reference plugins/query_expanders/
    * tsv.c): `key TAB word TAB word...` per line, '#' comments; expansion
    * joins the words as ((w1) OR (w2)).
    */
  def parseTsv(text: String): Map[String, String] =
    text.split('\n').iterator
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .flatMap { l =>
        l.split('\t').toSeq match {
          case key +: words if words.nonEmpty => Some(key -> orJoin(words))
          case _ => None
        }
      }.toMap

  /** Build an expander from a synonym DataFrame — the `TABLE.COLUMN` form
    * of `--query_expander`. `synCol` may be a string column (spliced raw)
    * or an array<string> column (elements OR-joined, the vector-column
    * form). Keys are normalized through `keyOf` at build time so lookups
    * and stored keys agree.
    */
  def fromTable(
      df: DataFrame, keyCol: String, synCol: String,
      keyOf: String => String = identity): QueryExpander = {
    val isVector = df.schema(synCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val pairs = df.select(keyCol, synCol).collect().flatMap { r =>
      Option(r.get(0)).map(_.toString).map { k =>
        val v =
          if (r.isNullAt(1)) ""
          else if (isVector) orJoin(r.getSeq[String](1))
          else r.get(1).toString
        keyOf(k) -> v
      }
    }
    QueryExpander(pairs.toMap, keyOf)
  }

  /** Faithful port of the reference term scanner
    * (grn_expr_syntax_expand_query_terms, lib/expr.c:7804-7917): spaces
    * and the single-char query operators copy through un-expanded, "OR"
    * copies through, quoted phrases expand as one term (original span
    * kept on a miss), a col-predicate prefix `col:op` copies verbatim and
    * the value restarts as a fresh term; everything else is a term,
    * replaced by its synonym expansion when the (normalized) term is a
    * key of the expansion table.
    */
  def expandTerms(
      q: String,
      synonyms: Map[String, String],
      keyOf: String => String,
      allowColumn: Boolean = true): String = {
    val sb = new StringBuilder
    var i = 0
    def isOpChar(c: Char): Boolean = "+><~-()*".indexOf(c) >= 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) { sb.append(c); i += 1 }
      else if (isOpChar(c)) { sb.append(c); i += 1 }
      else if (c == '"') {
        val start = i
        i += 1
        val buf = new StringBuilder
        var closed = false
        while (i < q.length && !closed) {
          val ch = q.charAt(i)
          if (ch == '"') { i += 1; closed = true }
          else if (ch == '\\' && i + 1 < q.length) { buf.append(q.charAt(i + 1)); i += 2 }
          else { buf.append(ch); i += 1 }
        }
        synonyms.get(keyOf(buf.toString)) match {
          case Some(r) => sb.append(r)
          case None => sb.append(q.substring(start, i))
        }
      } else if (c == 'O' && q.startsWith("OR", i) &&
          (i + 2 == q.length || q.charAt(i + 2).isWhitespace)) {
        sb.append("OR"); i += 2
      } else {
        var start = i
        var broke = false
        while (i < q.length && !broke) {
          val ch = q.charAt(i)
          if (ch.isWhitespace || ch == '(' || ch == ')' || ch == '*') broke = true
          else if (ch == ':' && allowColumn) {
            // `col:op` prefix (only under ALLOW_COLUMN — with the flag
            // cleared the ':' stays inside one literal term, reference
            // scanner gates on GRN_EXPR_ALLOW_COLUMN); ALLOW_UPDATE is
            // not on for select, so `:=` keeps the '=' in the value term
            var j = i + 1
            if (j < q.length) q.charAt(j) match {
              case '!' | '@' | '^' | '$' => j += 1
              case '<' | '>' => { j += 1; if (j < q.length && q.charAt(j) == '=') j += 1 }
              case _ => ()
            }
            sb.append(q.substring(start, j))
            i = j
            start = i
            broke = true
          } else i += 1
        }
        if (start < i) {
          val term = q.substring(start, i)
          sb.append(synonyms.getOrElse(keyOf(term), term))
        }
      }
    }
    sb.toString
  }
}
