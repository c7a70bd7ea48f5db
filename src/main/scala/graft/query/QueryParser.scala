package graft.query

/** Groonga `--query` syntax (reference lib/expr.c:6800-6935 parse loop +
  * get_word_ :6690, get_op :6460): whitespace-separated clauses combined
  * left-to-right with the pending operator; `+` = AND, `-` = AND_NOT,
  * `OR ` = OR, `>`/`<`/`~` = ADJUST (weight inc/dec/negate), `( )` groups,
  * `"..."` quotes a phrase, `*N`/`*S`/`*E` pragmas select NEAR / SIMILAR
  * mode / escalation threshold for the next clause, `col:op value` embeds a
  * column predicate (get_word_ column branch), a trailing `*` on a bare
  * word means prefix search. The default operator between clauses is AND
  * (grn_select parses with default_op = GRN_OP_AND).
  */
object QueryParser {

  /** `--query_flags` (reference grn_proc_expr_query_flags,
    * lib/proc/proc_select.c): which syntax classes the parser honors.
    * Default = ALLOW_PRAGMA|ALLOW_COLUMN; NONE treats `*X` and `col:v`
    * as plain text; ALLOW_LEADING_NOT permits a query-initial `-term`.
    */
  final case class QueryFlags(
      allowPragma: Boolean = true,
      allowColumn: Boolean = true,
      allowUpdate: Boolean = false,
      allowLeadingNot: Boolean = false)

  object QueryFlags {
    val default: QueryFlags = QueryFlags()
    /** The flags string REPLACES the default set (reference
      * grn_proc_expr_query_flags parses the literal union; NONE = empty).
      */
    def parse(s: String): QueryFlags = {
      val parts = s.split("[|,\\s]+").map(_.trim).filter(_.nonEmpty).toSet
      QueryFlags(
        allowPragma = parts.contains("ALLOW_PRAGMA"),
        allowColumn = parts.contains("ALLOW_COLUMN"),
        allowUpdate = parts.contains("ALLOW_UPDATE"),
        allowLeadingNot = parts.contains("ALLOW_LEADING_NOT"))
    }
  }

  sealed trait Node
  /** matches every record with score 0 — a blank or `*` query (reference
    * parses an empty condition as "all records").
    */
  case object MatchAll extends Node
  /** matches every record with score 1 — the implicit left operand of a
    * leading NOT under ALLOW_LEADING_NOT (reference grn_expr parse: the
    * dummy ALL_RECORDS call pushed before the negated clause).
    */
  case object AllRecords extends Node
  /** full-text match against the match column(s); phrase if quoted. */
  final case class Match(text: String, phrase: Boolean) extends Node
  final case class Prefix(prefix: String) extends Node
  final case class Near(text: String, maxInterval: Int) extends Node
  final case class Similar(text: String, threshold: Int) extends Node
  /** column predicate: op in {"", "!", "<", ">", "<=", ">=", "@", "^", "$", "~"} */
  final case class ColPred(colName: String, op: String, value: String) extends Node
  /** `col:=value` under ALLOW_UPDATE: assigns the value to every matched
    * record (no other condition → all records) and matches them all
    * (reference GRN_EXPR_ALLOW_UPDATE, lib/expr.c get_word assignment arm).
    */
  final case class ColAssign(colName: String, value: String) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class AndNot(l: Node, r: Node) extends Node
  final case class Adjust(l: Node, r: Node, weight: Double) extends Node

  final case class Parsed(root: Node, escalationThreshold: Option[Long])

  /** Reference rc=-63 GRN_SYNTAX_ERROR (lib/expr.c yyerror). */
  final class GrnSyntaxError(msg: String) extends IllegalArgumentException(msg)

  private final class P(s: String, flags: QueryFlags) {
    var i = 0
    var escalation: Option[Long] = None
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def ws(): Unit = while (!eof && s.charAt(i) == ' ') i += 1

    /** one clause: group, quoted phrase, pragma-prefixed clause, word. */
    def clause(): Node = {
      ws()
      require(!eof, "expected clause")
      peek match {
        case '(' =>
          i += 1
          val n = expr()
          ws()
          require(!eof && peek == ')', "expected )")
          i += 1
          n
        case '"' =>
          Match(quoted(), phrase = true)
        // `*N`/`*S`/`*E` pragmas only under ALLOW_PRAGMA and only when the
        // pragma letter follows; a bare `*` (or `*x...`) is a literal term
        // (reference parse loop: GRN_EXPR_ALLOW_PRAGMA gate; fixture
        // select/query/asterisk/only matches the literal "*")
        case '*' if flags.allowPragma && i + 1 < s.length &&
            "NSE".indexOf(s.charAt(i + 1)) >= 0 =>
          i += 2
          s.charAt(i - 1) match {
            case 'N' =>
              val n = number(10)
              ws()
              Near(clauseText(), n)
            case 'S' =>
              val n = number(0) // reference DEFAULT_SIMILARITY_THRESHOLD = 0
              ws()
              Similar(clauseText(), n)
            case _ => // 'E'
              escalation = Some(number(0).toLong)
              clause() // pragma applies to the whole query; continue
          }
        case _ => word()
      }
    }

    private def clauseText(): String =
      if (!eof && peek == '"') quoted()
      else bareWord()._1

    private def number(default: Int): Int = {
      val st = i
      while (!eof && (peek.isDigit || peek == '-')) i += 1
      if (i == st) default else s.substring(st, i).toInt
    }

    private def quoted(): String = {
      require(peek == '"')
      i += 1
      val sb = new StringBuilder
      while (!eof && peek != '"') {
        if (peek == '\\' && i + 1 < s.length) i += 1
        sb.append(peek)
        i += 1
      }
      require(!eof, "unterminated quote")
      i += 1
      sb.toString
    }

    /** Scan a bare word, unescaping `\x` and remembering which characters
      * were escaped (reference get_word, lib/expr.c:6690: GRN_QUERY_ESCAPE
      * makes the next char literal — `\(groonga\)*` is a prefix search for
      * "(groonga)"). Unescaped parens and quotes terminate the word.
      */
    private def bareWord(): (String, Array[Boolean]) = {
      val sb = new StringBuilder
      val esc = scala.collection.mutable.ArrayBuffer[Boolean]()
      var done = false
      while (!eof && !done) {
        val c = peek
        if (c == '\\' && i + 1 < s.length) {
          sb.append(s.charAt(i + 1)); esc += true; i += 2
        } else if (c == ' ' || c == '(' || c == ')' || c == '"') done = true
        else { sb.append(c); esc += false; i += 1 }
      }
      (sb.toString, esc.toArray)
    }

    /** Map every match-style leaf of a group to the column predicate that
      * prefixed it — `content:@(a OR b)` distributes `content:@` over the
      * group exactly like the reference parser keeps the pending column
      * context across a parenthesized expression.
      */
    private def distributeCol(colName: String, op: String, n: Node): Node = n match {
      case Match(t, _) => ColPred(colName, op, t)
      case Prefix(p) => ColPred(colName, "^", p)
      case And(l, r) => And(distributeCol(colName, op, l), distributeCol(colName, op, r))
      case Or(l, r) => Or(distributeCol(colName, op, l), distributeCol(colName, op, r))
      case AndNot(l, r) => AndNot(distributeCol(colName, op, l), distributeCol(colName, op, r))
      case Adjust(l, r, w) => Adjust(distributeCol(colName, op, l), distributeCol(colName, op, r), w)
      case other => other
    }

    /** word, possibly `col:opvalue` or trailing-`*` prefix. */
    private def word(): Node = {
      val (w, esc) = bareWord()
      require(w.nonEmpty, s"empty word at $i")
      val colon = (0 until w.length).find(j => w.charAt(j) == ':' && !esc(j)).getOrElse(-1)
      if (flags.allowColumn && colon > 0) {
        val colName = w.substring(0, colon)
        val rest = w.substring(colon + 1)
        if (rest.startsWith("=")) {
          if (flags.allowUpdate) return ColAssign(colName, rest.drop(1))
          // without ALLOW_UPDATE the '=' begins the VALUE term (reference
          // expand/parse scanners advance 1 past ':' only); a following
          // quoted phrase is the value: `content:"=groonga storage engine"`
          if (rest.isEmpty && !eof && peek == '"') return ColPred(colName, "", quoted())
          return ColPred(colName, "", rest)
        }
        val (op, v) =
          if (rest.startsWith("<=") || rest.startsWith(">=")) (rest.take(2), rest.drop(2))
          else if (rest.nonEmpty && "!<>@^$~".contains(rest.head)) (rest.take(1), rest.drop(1))
          else ("", rest)
        if (v.isEmpty && !eof && peek == '"') ColPred(colName, op, quoted())
        else if (v.isEmpty && !eof && peek == '(') {
          i += 1
          val g = expr()
          ws()
          require(!eof && peek == ')', "expected )")
          i += 1
          distributeCol(colName, op, g)
        } else ColPred(colName, op, v)
      } else if (w.length > 1 && w.endsWith("*") && !esc(w.length - 1)) {
        Prefix(w.dropRight(1))
      } else Match(w, phrase = false)
    }

    /** left-fold of clauses with pending operators (default AND). */
    def expr(): Node = {
      ws()
      // a leading `-` is a syntax error unless ALLOW_LEADING_NOT, which
      // rewrites it to (all records) AND_NOT clause with score 1 per record
      // (reference lib/expr.c parse loop: GRN_EXPR_ALLOW_LEADING_NOT)
      var acc: Node =
        if (!eof && peek == '-') {
          if (!flags.allowLeadingNot)
            throw new GrnSyntaxError(s"Syntax error: <|-|${s.substring(i + 1)}>")
          i += 1
          AndNot(AllRecords, clause())
        } else clause()
      var done = false
      while (!done) {
        ws()
        if (eof || peek == ')') done = true
        else peek match {
          case '+' => i += 1; acc = And(acc, clause())
          case '-' => i += 1; acc = AndNot(acc, clause())
          case '>' => i += 1; acc = Adjust(acc, clause(), 2.0)
          case '<' => i += 1; acc = Adjust(acc, clause(), 0.5)
          case '~' => i += 1; acc = Adjust(acc, clause(), -1.0)
          // reference parse_query (lib/expr.c:6920-6925) requires a SPACE
          // after OR — a trailing "OR" at end-of-input is the term "OR"
          case 'O' if s.startsWith("OR ", i) =>
            i += 2; acc = Or(acc, clause())
          case _ => acc = And(acc, clause())
        }
      }
      acc
    }
  }

  def parse(q: String, flags: QueryFlags = QueryFlags.default): Parsed = {
    val p = new P(q.trim, flags)
    val root = p.expr()
    Parsed(root, p.escalation)
  }

  /** The POSITIVE match keywords of a query — what snippet/highlight
    * output functions tag. Mirrors the reference's
    * grn_expr_get_keywords (lib/expr.c:8003): ONLY GRN_OP_MATCH scan
    * units are pulled — match clauses (incl. phrases), `col:@value`
    * predicates, and BOTH sides of an adjust (an adjust clause is a MATCH
    * unit under GRN_OP_ADJUST, which passes the keyword filter) — while
    * near/similar/prefix units and anything under AND_NOT are excluded
    * (their ops are not GRN_OP_MATCH / negated terms never highlight).
    * An unparsable query degrades to whitespace terms, the best-effort
    * pull.
    */
  def matchKeywords(q: String, flags: QueryFlags = QueryFlags.default): Seq[String] = {
    def collect(n: Node): Seq[String] = n match {
      case Match(t, _) => Seq(t)
      case ColPred(_, "@", v) => Seq(v)
      case And(l, r) => collect(l) ++ collect(r)
      case Or(l, r) => collect(l) ++ collect(r)
      case AndNot(l, _) => collect(l)
      case Adjust(l, r, _) => collect(l) ++ collect(r)
      case _ => Seq.empty
    }
    try collect(parse(q, flags).root)
    catch { case scala.util.control.NonFatal(_) => q.split("\\s+").toSeq }
  }
}
