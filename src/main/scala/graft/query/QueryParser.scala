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
  /** full-text match against the match column(s); phrase if quoted. */
  final case class Match(text: String, phrase: Boolean) extends Node
  final case class Prefix(prefix: String) extends Node
  final case class Near(text: String, maxInterval: Int) extends Node
  final case class Similar(text: String, threshold: Int) extends Node
  /** column predicate: op in {"", "!", "<", ">", "<=", ">=", "@", "^", "$", "~"} */
  final case class ColPred(colName: String, op: String, value: String) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class AndNot(l: Node, r: Node) extends Node
  final case class Adjust(l: Node, r: Node, weight: Double) extends Node

  final case class Parsed(root: Node, escalationThreshold: Option[Long])

  private final class P(s: String) {
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
        case '*' =>
          i += 1
          require(!eof, "dangling *")
          val kind = peek
          i += 1
          kind match {
            case 'N' =>
              val n = number(10)
              ws()
              Near(clauseText(), n)
            case 'S' =>
              val n = number(0) // reference DEFAULT_SIMILARITY_THRESHOLD = 0
              ws()
              Similar(clauseText(), n)
            case 'E' =>
              escalation = Some(number(0).toLong)
              clause() // pragma applies to the whole query; continue
            case other => throw new IllegalArgumentException(s"unknown pragma *$other")
          }
        case _ => word()
      }
    }

    private def clauseText(): String =
      if (!eof && peek == '"') quoted()
      else { val w = bareWord(); w }

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

    private def bareWord(): String = {
      val st = i
      while (!eof && peek != ' ' && peek != '(' && peek != ')') i += 1
      s.substring(st, i)
    }

    /** word, possibly `col:opvalue` or trailing-`*` prefix. */
    private def word(): Node = {
      val w = bareWord()
      require(w.nonEmpty, s"empty word at $i")
      val colon = w.indexOf(':')
      if (colon > 0) {
        val colName = w.substring(0, colon)
        val rest = w.substring(colon + 1)
        val (op, v) =
          if (rest.startsWith("<=") || rest.startsWith(">=")) (rest.take(2), rest.drop(2))
          else if (rest.nonEmpty && "!<>@^$~".contains(rest.head)) (rest.take(1), rest.drop(1))
          else ("", rest)
        ColPred(colName, op, v)
      } else if (w.length > 1 && w.endsWith("*")) {
        Prefix(w.dropRight(1))
      } else Match(w, phrase = false)
    }

    /** left-fold of clauses with pending operators (default AND). */
    def expr(): Node = {
      var acc = clause()
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
          case 'O' if s.startsWith("OR ", i) || s.substring(i) == "OR" =>
            i += 2; acc = Or(acc, clause())
          case _ => acc = And(acc, clause())
        }
      }
      acc
    }
  }

  def parse(q: String): Parsed = {
    val p = new P(q.trim)
    val root = p.expr()
    Parsed(root, p.escalation)
  }
}
