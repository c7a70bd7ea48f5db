package graft.script

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Groonga script-syntax expressions (the `--filter`/`--scorer`/expression
  * `--output_columns` surface), re-expressed as a parser + Catalyst lowering.
  *
  * The reference implements this as a lemon grammar compiled to a stack VM
  * (grammar `lib/grn_ecmascript.lemon:40-330`, lexer `lib/expr.c:7015-7450`,
  * sequential executor `lib/expr.c:2437+`). Here the grammar is a hand
  * recursive-descent parser over the same token set and precedence ladder,
  * and "execution" is lowering to Catalyst `Column`s — the expression then
  * runs codegen'd inside whole-stage codegen, distributed, instead of in a
  * per-record interpreter loop.
  *
  * Groonga semantics preserved:
  *   - fixed-width integer columns: `>>>` shifts in the column's unsigned
  *     width domain; assignment stores wrap to the declared width
  *   - assignment operators (`=`, `+=`, `&=`, ...) are expressions that
  *     update a named column (`--scorer 'output &= value'`)
  *   - match-family operators `@ @^ @$ @~ *N *S` with vector-aware
  *     sequential fallbacks
  *   - truthiness: non-zero number, non-empty string/vector, true
  *   - score accumulation: every satisfied predicate contributes score
  *     (AND/OR sum their satisfied branches, reference `res_add`)
  */
object ScriptExpr {

  // ---------------------------------------------------------------- types

  /** Groonga value types relevant to expression semantics
    * (reference type ids, lib/groonga.h GRN_DB_INT8..GRN_DB_LONG_TEXT).
    */
  sealed trait GType
  final case class GInt(bits: Int, signed: Boolean) extends GType
  case object GFloat extends GType
  case object GText extends GType
  case object GBool extends GType
  case object GTime extends GType
  final case class GVec(elem: GType) extends GType
  case object GNull extends GType
  case object GAny extends GType

  def typeOfName(n: String): GType = n match {
    case "Int8" => GInt(8, signed = true)
    case "Int16" => GInt(16, signed = true)
    case "Int32" => GInt(32, signed = true)
    case "Int64" => GInt(64, signed = true)
    case "UInt8" => GInt(8, signed = false)
    case "UInt16" => GInt(16, signed = false)
    case "UInt32" => GInt(32, signed = false)
    case "UInt64" => GInt(64, signed = false)
    case "Float" | "Float32" => GFloat
    case "Bool" => GBool
    case "Time" => GTime
    case _ => GText // ShortText/Text/LongText/geo points/table references
  }

  /** A lowered value: Catalyst column + Groonga type; `score` carries the
    * predicate's score contribution (match weight), `litv` the literal value
    * when the expression is a constant (needed for record lookups, option
    * maps, and time-string coercion).
    */
  final case class TVal(
      col: Column,
      t: GType,
      score: Option[Column] = None,
      litv: Option[Any] = None,
      /** Source column path when this value is a direct column reference
        * (lets env functions like fuzzy_search's max_expansion find the
        * column's value domain).
        */
      path: Option[Seq[String]] = None,
      /** Predicate form when it differs from the value form (logical ops
        * return VALUES in the reference, ECMAScript-style, but filter as
        * booleans).
        */
      bool: Option[Column] = None)

  /** Resolution context supplied by the caller (the select runner, or a
    * library user binding a DataFrame schema).
    */
  trait Env {
    /** Resolve a (possibly dotted) column path to a typed column. */
    def resolve(path: Seq[String]): Option[TVal]

    /** Constant record lookup `Table["key"]` → column values of that row
      * (with the table's normalizer applied to the key), or None if the
      * name is not a table / key absent (reference accessor
      * grn_table_get + column read, lib/db.c).
      */
    def record(table: String, key: Any): Option[Map[String, TVal]] = None

    /** Normalizer of the primary table's key, if any — string constants
      * compared for equality against `_key` normalize through it first
      * (reference key lookup semantics: grn_table_get normalizes the
      * probe key before the hash/pat lookup, lib/db.c).
      */
    def keyNormalizer: Option[String => String] = None

    /** Function call; return None for "unknown function" (an error). */
    def call(name: String, args: Seq[TVal]): Option[TVal] =
      ScriptExpr.defaultCall(name, args)

    /** Call with UNevaluated argument ASTs; return None to fall back to
      * the value-lowered [[call]]. Needed by selector functions whose
      * first argument is an accessor path rather than a value — e.g.
      * `sub_filter(comment_index, "...")` names an index column that has
      * no value form (reference lib/proc.c:5318 resolves it as a scope).
      */
    def callRaw(name: String, args: Seq[Ast], lower: Ast => TVal): Option[TVal] = None

    /** Match-family operator (`@ @^ @$ @~ *N *S *T`); override to route
      * through an index; the default is the sequential scan semantics.
      */
    def matchOp(op: String, l: TVal, r: TVal): TVal =
      ScriptExpr.defaultMatch(op, l, r)
  }

  // ---------------------------------------------------------------- AST

  sealed trait Ast
  final case class Num(text: String) extends Ast
  final case class Str(s: String) extends Ast
  final case class BoolL(b: Boolean) extends Ast
  case object NullL extends Ast
  final case class Id(name: String) extends Ast
  final case class Member(obj: Ast, name: String) extends Ast
  final case class IndexOf(obj: Ast, idx: Ast) extends Ast
  final case class CallN(target: Ast, args: Seq[Ast]) extends Ast
  final case class Un(op: String, e: Ast) extends Ast
  final case class Bin(op: String, l: Ast, r: Ast) extends Ast
  final case class Cond(c: Ast, t: Ast, f: Ast) extends Ast
  final case class AssignN(op: String, target: Ast, value: Ast) extends Ast
  final case class Comma(es: Seq[Ast]) extends Ast
  final case class Arr(es: Seq[Ast]) extends Ast
  final case class ObjL(fields: Seq[(String, Ast)]) extends Ast

  final class ScriptError(msg: String) extends IllegalArgumentException(msg)

  // ---------------------------------------------------------------- lexer

  private final case class Tok(kind: String, text: String) // NUM STR ID OP EOF

  /** Multi-char operators, longest first (lexer `lib/expr.c:7169-7448`). */
  private val multiOps = Seq(
    ">>>=", "<<=", ">>=", ">>>", "==", "!=", "<=", ">=", "&&", "&!", "||",
    "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "++", "--",
    "@^", "@$", "@~", "<<", ">>", "*N", "*S", "*T", "*<", "*>", "*~")
  private val singleOps = "+-*/%!~<>=&|^@()[]{},.?:$"

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'') {
        val q = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src.charAt(i) != q) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val e = src.charAt(i + 1)
            // reference unescape: quote and backslash collapse; any other
            // escape keeps the backslash (regex patterns like \A survive)
            if (e == q || e == '\\') { sb.append(e); i += 2 }
            else { sb.append(ch); i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        if (i >= n) throw new ScriptError(s"unterminated string in: $src")
        i += 1
        out += Tok("STR", sb.toString)
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        if (c == '0' && i + 1 < n &&
            (src.charAt(i + 1) == 'x' || src.charAt(i + 1) == 'X')) {
          i += 2
          while (i < n && Character.digit(src.charAt(i), 16) >= 0) i += 1
        } else {
          while (i < n && src.charAt(i).isDigit) i += 1
          if (i < n && src.charAt(i) == '.' && i + 1 < n && src.charAt(i + 1).isDigit) {
            i += 1
            while (i < n && src.charAt(i).isDigit) i += 1
          }
          if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
            var j = i + 1
            if (j < n && (src.charAt(j) == '+' || src.charAt(j) == '-')) j += 1
            if (j < n && src.charAt(j).isDigit) {
              i = j
              while (i < n && src.charAt(i).isDigit) i += 1
            }
          }
        }
        out += Tok("NUM", src.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        out += Tok("ID", src.substring(start, i))
      } else {
        val rem = src.substring(i)
        multiOps.find(rem.startsWith) match {
          case Some(op) =>
            // near with an explicit distance: *N10"a b" — digits attach
            if (op == "*N") {
              var j = i + 2
              while (j < n && src.charAt(j).isDigit) j += 1
              out += Tok("OP", src.substring(i, j)); i = j
            } else { out += Tok("OP", op); i += op.length }
          case None =>
            if (singleOps.indexOf(c) < 0)
              throw new ScriptError(s"unexpected character '$c' in: $src")
            out += Tok("OP", c.toString); i += 1
        }
      }
    }
    out += Tok("EOF", "")
    out.result()
  }

  // ---------------------------------------------------------------- parser

  /** Recursive descent over the reference's precedence ladder
    * (grn_ecmascript.lemon: assignment > conditional > logical-or >
    * logical-and/and-not > bit-or > bit-xor > bit-and > equality >
    * relational(+match family) > shift > additive > multiplicative >
    * unary > postfix > call/member > primary).
    */
  def parse(src: String): Ast = {
    val toks = lex(src)
    var pos = 0
    def peek: Tok = toks(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectOp(op: String): Unit = {
      val t = next()
      if (t.kind != "OP" || t.text != op)
        throw new ScriptError(s"expected '$op', got '${t.text}' in: $src")
    }
    def at(op: String): Boolean = peek.kind == "OP" && peek.text == op
    def eat(op: String): Boolean = { if (at(op)) { pos += 1; true } else false }

    val assignOps = Set("=", "+=", "-=", "*=", "/=", "%=", "<<=", ">>=",
      ">>>=", "&=", "|=", "^=")

    def expression(): Ast = {
      val first = assignment()
      if (at(",")) {
        val es = scala.collection.mutable.ArrayBuffer(first)
        while (eat(",")) es += assignment()
        Comma(es.toSeq)
      } else first
    }
    def assignment(): Ast = {
      val lhs = conditional()
      if (peek.kind == "OP" && assignOps(peek.text)) {
        lhs match {
          case _: Id | _: Member | _: IndexOf =>
            val op = next().text
            AssignN(op, lhs, assignment())
          case _ => throw new ScriptError(s"invalid assignment target in: $src")
        }
      } else lhs
    }

    def conditional(): Ast = {
      val c = logicalOr()
      if (eat("?")) {
        val t = assignment()
        expectOp(":")
        val f = assignment()
        Cond(c, t, f)
      } else c
    }

    def binLevel(ops: Set[String], sub: () => Ast): Ast = {
      var l = sub()
      while (peek.kind == "OP" && ops(peek.text)) {
        val op = next().text
        l = Bin(op, l, sub())
      }
      l
    }

    def logicalOr(): Ast = binLevel(Set("||"), () => logicalAnd())
    def logicalAnd(): Ast = binLevel(Set("&&", "&!"), () => bitOrE())
    def bitOrE(): Ast = binLevel(Set("|"), () => bitXorE())
    def bitXorE(): Ast = binLevel(Set("^"), () => bitAndE())
    def bitAndE(): Ast = binLevel(Set("&"), () => equality())
    def equality(): Ast = binLevel(Set("==", "!="), () => relational())
    def relational(): Ast = {
      var l = shift()
      while ((peek.kind == "OP" && (Set("<", ">", "<=", ">=", "@", "@^",
          "@$", "@~", "*S", "*T").contains(peek.text) ||
          peek.text.startsWith("*N"))) ||
          (peek.kind == "ID" && peek.text == "in")) {
        val op = next().text
        l = Bin(op, l, shift())
      }
      l
    }
    def shift(): Ast = binLevel(Set("<<", ">>", ">>>"), () => additive())
    def additive(): Ast = binLevel(Set("+", "-"), () => multiplicative())
    def multiplicative(): Ast = binLevel(Set("*", "/", "%"), () => unary())

    def unary(): Ast = {
      if (peek.kind == "OP" && Set("+", "-", "!", "~", "++", "--").contains(peek.text)) {
        val op = next().text
        Un(op, unary())
      } else if (peek.kind == "ID" && peek.text == "delete") {
        next(); Un("delete", unary())
      } else postfix()
    }

    def postfix(): Ast = {
      var e = primary()
      var done = false
      while (!done) {
        if (eat(".")) {
          val t = next()
          if (t.kind != "ID") throw new ScriptError(s"expected member name in: $src")
          e = Member(e, t.text)
        } else if (eat("[")) {
          val idx = expression()
          expectOp("]")
          e = IndexOf(e, idx)
        } else if (at("(")) {
          pos += 1
          val args = scala.collection.mutable.ArrayBuffer[Ast]()
          if (!at(")")) {
            args += assignment()
            while (eat(",")) args += assignment()
          }
          expectOp(")")
          e = CallN(e, args.toSeq)
        } else done = true
      }
      e
    }

    def primary(): Ast = {
      val t = next()
      t.kind match {
        case "NUM" => Num(t.text)
        case "STR" => Str(t.text)
        case "ID" => t.text match {
          case "true" => BoolL(true)
          case "false" => BoolL(false)
          case "null" => NullL
          case name => Id(name)
        }
        case "OP" if t.text == "(" =>
          val e = expression(); expectOp(")"); e
        case "OP" if t.text == "[" =>
          val es = scala.collection.mutable.ArrayBuffer[Ast]()
          if (!at("]")) {
            es += assignment()
            while (eat(",")) if (!at("]")) es += assignment()
          }
          expectOp("]")
          Arr(es.toSeq)
        case "OP" if t.text == "{" =>
          val fs = scala.collection.mutable.ArrayBuffer[(String, Ast)]()
          if (!at("}")) {
            def field(): Unit = {
              val k = next()
              if (k.kind != "STR" && k.kind != "ID")
                throw new ScriptError(s"bad object key in: $src")
              expectOp(":")
              fs += k.text -> assignment()
            }
            field()
            while (eat(",")) field()
          }
          expectOp("}")
          ObjL(fs.toSeq)
        case _ =>
          throw new ScriptError(s"unexpected token '${t.text}' in: $src")
      }
    }

    val root = expression()
    if (peek.kind != "EOF")
      throw new ScriptError(s"trailing tokens from '${peek.text}' in: $src")
    root
  }

  // ------------------------------------------------------------- lowering

  final case class Lowered(value: TVal, assigns: Seq[(String, Column)])

  def lower(src: String, env: Env): Lowered = lowerAst(parse(src), env)

  def lowerAst(root: Ast, env: Env): Lowered = {
    val assigns = scala.collection.mutable.ArrayBuffer[(String, Column)]()
    // assignment shadowing: later expressions see earlier assigned values
    val shadow = scala.collection.mutable.Map[String, TVal]()

    def resolvePath(path: Seq[String]): TVal =
      shadow.getOrElse(path.mkString("."),
        env.resolve(path).getOrElse(
          throw new ScriptError(s"unknown column ${path.mkString(".")}")))
        .copy(path = Some(path))

    def pathOf(ast: Ast): Option[Seq[String]] = ast match {
      case Id(n) => Some(Seq(n))
      case Member(o, n) => pathOf(o).map(_ :+ n)
      case _ => None
    }

    def lo(ast: Ast): TVal = ast match {
      case Num(text) =>
        if (text.startsWith("0x") || text.startsWith("0X")) {
          val v = java.lang.Long.parseLong(text.drop(2), 16)
          TVal(lit(v), GInt(64, signed = true), litv = Some(v))
        } else if (text.contains('.') || text.contains('e') || text.contains('E')) {
          val v = text.toDouble
          TVal(lit(v), GFloat, litv = Some(v))
        } else {
          val v = text.toLong
          TVal(lit(v), GInt(64, signed = true), litv = Some(v))
        }
      case Str(s) => TVal(lit(s), GText, litv = Some(s))
      case BoolL(b) => TVal(lit(b), GBool, litv = Some(b))
      case NullL => TVal(lit(null).cast("string"), GNull, litv = Some(null))
      case Id(_) | Member(_, _) =>
        pathOf(ast) match {
          case Some(path) => resolvePath(path)
          case None =>
            ast match {
              case Member(obj, name) =>
                val base = lo(obj)
                base.litv match {
                  case Some(m: Map[_, _]) =>
                    m.asInstanceOf[Map[String, TVal]].getOrElse(name,
                      throw new ScriptError(s"no column $name in record"))
                  case _ => throw new ScriptError(s"cannot access member $name")
                }
              case _ => throw new ScriptError("unreachable")
            }
        }
      case IndexOf(obj, idx) =>
        val i = lo(idx)
        obj match {
          case Id(tname) if env.resolve(Seq(tname)).isEmpty =>
            // Table["key"] record lookup (constant), reference accessor form
            val key = i.litv.getOrElse(
              throw new ScriptError("record lookup needs a literal key"))
            val rec = env.record(tname, key).getOrElse(
              throw new ScriptError(s"no record $tname[$key]"))
            TVal(lit(null).cast("string"), GAny, litv = Some(rec))
          case _ =>
            val v = lo(obj)
            v.t match {
              case GVec(et) =>
                // Groonga vectors index 0-based; element_at is 1-based;
                // out-of-range reads null (no error), like the reference
                TVal(call_function("try_element_at", v.col, i.col.cast("int") + 1), et)
              case GText =>
                TVal(substring(v.col, 0, 0), GText) // degenerate; rare
              case _ => throw new ScriptError("cannot index non-vector")
            }
        }
      case Arr(es) =>
        val vs = es.map(lo)
        val et = vs.headOption.map(_.t).getOrElse(GNull)
        TVal(array(vs.map(_.col): _*), GVec(et),
          litv = if (vs.forall(_.litv.isDefined)) Some(vs.map(_.litv.get)) else None)
      case ObjL(fields) =>
        val m = fields.map { case (k, a) => k -> lo(a) }
        TVal(lit(null).cast("string"), GAny,
          litv = Some(m.map { case (k, tv) => k -> tv.litv.orNull }.toMap))
      case CallN(target, args) =>
        val name = pathOf(target).map(_.mkString("."))
          .getOrElse(throw new ScriptError("computed function names unsupported"))
        env.callRaw(name, args, lo).getOrElse(
          env.call(name, args.map(lo)).getOrElse(
            throw new ScriptError(s"unknown function $name")))
      case Un(op, e) =>
        val v = lo(e)
        op match {
          case "-" => v.t match {
            case GFloat => TVal(negate(v.col), GFloat)
            case GText => TVal(negate(v.col.cast("double")), GFloat)
            case _ => TVal(negate(v.col.cast("long")), GInt(64, signed = true))
          }
          case "+" => v
          case "!" => TVal(!truthy(v), GBool)
          case "~" => TVal(bitwise_not(v.col.cast("long")), GInt(64, signed = true))
          case "++" | "--" | "delete" =>
            throw new ScriptError(s"operator $op unsupported in filters")
        }
      case Cond(c, t, f) =>
        val (tv, fv) = (lo(t), lo(f))
        val rt = unifyType(tv.t, fv.t)
        TVal(when(truthy(lo(c)), castTo(tv, rt)).otherwise(castTo(fv, rt)), rt)
      case Comma(es) =>
        val vs = es.map(lo)
        vs.last
      case AssignN(op, target, value) =>
        val path = pathOf(target).getOrElse(
          throw new ScriptError("unsupported assignment target"))
        val name = path.mkString(".")
        val cur = () => resolvePath(path)
        val rhs = lo(value)
        val newVal: TVal = op match {
          case "=" => rhs
          case _ => binop(op.dropRight(1), cur(), rhs, env)
        }
        val declared = env.resolve(path).map(_.t).getOrElse(GAny)
        val stored = store(newVal, declared, isScore = name == "_score")
        assigns += name -> stored.col
        shadow(name) = stored
        stored
      case Bin(op @ ("==" | "!="), l, r) if env.keyNormalizer.isDefined &&
          (pathOf(l).contains(Seq("_key")) || pathOf(r).contains(Seq("_key"))) =>
        // equality against `_key` of a normalized table normalizes the
        // constant side (the stored key IS the normalized form)
        val f = env.keyNormalizer.get
        def normLit(v: TVal): TVal = v.litv match {
          case Some(s: String) => TVal(lit(f(s)), v.t, litv = Some(f(s)))
          case _ => v
        }
        val lv = lo(l); val rv = lo(r)
        binop(op,
          if (pathOf(r).contains(Seq("_key"))) normLit(lv) else lv,
          if (pathOf(l).contains(Seq("_key"))) normLit(rv) else rv, env)
      case Bin(op, l, r) => binop(op, lo(l), lo(r), env)
    }

    def binop(op: String, l: TVal, r: TVal, env: Env): TVal = op match {
      case "&&" =>
        // ECMAScript value semantics: l falsy → l, else r (the reference's
        // fixture `"not false" && 29 && name` outputs the last operand);
        // predicate form tracked separately for filter truthiness
        // a null operand surfaces as false, not null (fixture
        // logical_operation/and/null wants `false`)
        val vt = unifyType(l.t, r.t)
        def fb(v: TVal) = coalesce(castTo(v, vt), castTo(TVal(lit(false), GBool), vt))
        TVal(when(truthy(l), fb(r)).otherwise(fb(l)), vt,
          score = Some(scoreOf(l) + scoreOf(r)),
          bool = Some(truthy(l) && truthy(r)))
      case "||" =>
        val vt = unifyType(l.t, r.t)
        def fb(v: TVal) = coalesce(castTo(v, vt), castTo(TVal(lit(false), GBool), vt))
        TVal(when(truthy(l), fb(l)).otherwise(fb(r)), vt,
          score = Some(when(truthy(l), scoreOf(l)).otherwise(lit(0.0)) +
            when(truthy(r), scoreOf(r)).otherwise(lit(0.0))),
          bool = Some(truthy(l) || truthy(r)))
      case "&!" =>
        TVal(truthy(l) && !truthy(r), GBool, score = Some(scoreOf(l)))
      case "|" => TVal(l.col.cast("long").bitwiseOR(r.col.cast("long")), GInt(64, signed = true))
      case "^" => TVal(l.col.cast("long").bitwiseXOR(r.col.cast("long")), GInt(64, signed = true))
      case "&" => TVal(l.col.cast("long").bitwiseAND(r.col.cast("long")), GInt(64, signed = true))
      case "==" | "!=" =>
        val eq = equalCol(l, r)
        TVal(if (op == "==") eq else !eq, GBool)
      case "<" | ">" | "<=" | ">=" =>
        TVal(compareCol(op, l, r), GBool)
      case "in" =>
        r.t match {
          case GVec(_) => TVal(array_contains(r.col, l.col), GBool)
          case _ => TVal(contains(r.col.cast("string"), l.col.cast("string")), GBool)
        }
      case "@" | "@^" | "@$" | "@~" | "*S" | "*T" => env.matchOp(op, l, r)
      case near if near.startsWith("*N") => env.matchOp(near, l, r)
      case "<<" => shiftOp(l, r, "shiftleft")
      case ">>" => shiftOp(l, r, "shiftright")
      case ">>>" =>
        // unsigned shift in the operand's declared width (reference
        // GRN_OP_SHIFTRR on fixed-width ints): mask to width, then the
        // value is non-negative so an arithmetic shift is the logical one
        val bits = l.t match { case GInt(b, _) => b; case _ => 64 }
        val n = shiftAmount(r)
        if (bits == 64)
          TVal(call_function("shiftrightunsigned", l.col.cast("long"), n),
            GInt(64, signed = true))
        else {
          val mask = (1L << bits) - 1
          TVal(call_function("shiftright",
            l.col.cast("long").bitwiseAND(lit(mask)), n),
            GInt(64, signed = true))
        }
      case "+" =>
        if (l.t == GText && r.t == GText)
          TVal(concat(l.col, r.col), GText,
            litv = for { a <- l.litv; b <- r.litv } yield s"$a$b")
        else arith(l, r)(_ + _)
      case "-" => arith(l, r)(_ - _)
      case "*" => arith(l, r)(_ * _)
      case "/" =>
        if (isFloat(l) || isFloat(r))
          TVal(l.col.cast("double") / r.col.cast("double"), GFloat)
        else {
          // integer division truncating toward zero (C semantics); MIN/-1
          // wraps instead of raising (reference fixed-width arithmetic)
          val ll = l.col.cast("long"); val rr = r.col.cast("long")
          val divided = when(rr === -1L,
            when(ll === Long.MinValue, lit(Long.MinValue)).otherwise(-ll))
            .otherwise(call_function("div", ll, rr))
          wrapArith(l, TVal(divided, GInt(64, signed = true)))
        }
      case "%" =>
        if (isFloat(l) || isFloat(r))
          TVal(l.col.cast("double") % r.col.cast("double"), GFloat)
        else TVal(l.col.cast("long") % r.col.cast("long"), GInt(64, signed = true))
      case other => throw new ScriptError(s"operator $other unsupported")
    }

    def arith(l: TVal, r: TVal)(f: (Column, Column) => Column): TVal =
      if (isFloat(l) || isFloat(r))
        TVal(f(l.col.cast("double"), r.col.cast("double")), GFloat)
      else wrapArith(l, TVal(f(numCol(l), numCol(r)), GInt(64, signed = true)))

    /** Integer arithmetic evaluates in the lhs operand's declared width:
      * `value / -1` on Int32 MIN yields Int32 MIN again (reference
      * fixed-width semantics; fixture arithmetic_operation/slash/
      * int32_min_and_minus_one).
      */
    def wrapArith(l: TVal, res: TVal): TVal = l.t match {
      case GInt(bits, signed) if bits < 64 =>
        TVal(wrapInt(res.col, bits, signed), GInt(bits, signed))
      case _ => res
    }

    def shiftOp(l: TVal, r: TVal, fn: String): TVal =
      TVal(call_function(fn, l.col.cast("long"), shiftAmount(r)),
        GInt(64, signed = true))

    val value = lo(root)
    Lowered(value, assigns.toSeq)
  }

  private def isFloat(v: TVal): Boolean = v.t match {
    case GFloat | GTime => true
    case GText => v.litv.exists { case s: String => s.contains('.'); case _ => false }
    case _ => false
  }

  private def numCol(v: TVal): Column = v.t match {
    case GInt(_, _) | GBool => v.col.cast("long")
    case GFloat | GTime => v.col.cast("double")
    case _ => v.col.cast("long")
  }

  private def shiftAmount(r: TVal): Column = r.col.cast("int")

  /** Groonga truthiness: false/0/0.0/"" are false; a VECTOR value is
    * always true, even empty (reference grn_obj_is_true, lib/obj.c — a
    * vector object exists regardless of elements; fixture
    * no_index/score/vector/empty matches the empty-tags row).
    */
  def truthy(v: TVal): Column = v.bool.getOrElse(v.t match {
    case GBool => coalesce(v.col, lit(false))
    case GInt(_, _) => coalesce(v.col =!= 0L, lit(false))
    case GFloat | GTime => coalesce(v.col =!= 0.0, lit(false))
    case GText => coalesce(v.col =!= "", lit(false))
    case GVec(_) => lit(true)
    case GNull => lit(false)
    case GAny => coalesce(v.col.cast("boolean"), lit(false))
  })

  /** Predicate score contribution: numeric filter values score their own
    * value (fixture no_index/score/string/positive_number: `--filter '"29"'`
    * scores 29), predicates score 1.
    */
  def scoreOf(v: TVal): Column = v.score.getOrElse {
    val value: Column = v.t match {
      case GInt(_, _) | GFloat => v.col.cast("double")
      case GText =>
        val n = when(v.col.cast("string").rlike("^\\s*-?\\d+(\\.\\d+)?\\s*$"),
          v.col.cast("double"))
        coalesce(n, lit(1.0))
      case _ => lit(1.0)
    }
    when(truthy(v), value).otherwise(lit(0.0))
  }

  private def unifyType(a: GType, b: GType): GType = (a, b) match {
    case (x, y) if x == y => x
    case (GFloat, GInt(_, _)) | (GInt(_, _), GFloat) => GFloat
    case (GNull, x) => x
    case (x, GNull) => x
    case _ => GAny
  }

  private def castTo(v: TVal, t: GType): Column = t match {
    case GFloat => v.col.cast("double")
    case GInt(_, _) => v.col.cast("long")
    case GText => v.col.cast("string")
    case GAny => v.col.cast("string") // mixed-type branches unify as text
    case _ => v.col
  }

  /** Equality with Groonga coercions: numbers compare numerically, a text
    * side against a number casts to number (uncastable → no match), Time
    * against a text literal parses the time, vector == "" tests emptiness,
    * vector == [..] compares element-wise.
    */
  private def equalCol(l: TVal, r: TVal): Column = (l.t, r.t) match {
    case (GVec(_), _) if r.litv.contains("") => size(l.col) === 0
    case (_, GVec(_)) if l.litv.contains("") => size(r.col) === 0
    // vector-to-vector comparison never matches (reference: unsupported
    // comparison yields no records; fixture vector/equal wants 0 rows)
    case (GVec(_), GVec(_)) => lit(false)
    case (GVec(_), _) | (_, GVec(_)) => lit(false)
    case (GText, GText) => l.col === r.col
    case (GTime, GText) => l.col === timeLit(r)
    case (GText, GTime) => timeLit(l) === r.col
    case (GText, _) => tryNum(l) === r.col.cast("double")
    case (_, GText) => l.col.cast("double") === tryNum(r)
    case (GBool, _) | (_, GBool) => l.col.cast("boolean") === r.col.cast("boolean")
    case _ =>
      if (isFloat(l) || isFloat(r)) l.col.cast("double") === r.col.cast("double")
      else l.col.cast("long") === r.col.cast("long")
  }

  private def compareCol(op: String, l: TVal, r: TVal): Column = {
    def cmp(a: Column, b: Column): Column = op match {
      case "<" => a < b
      case ">" => a > b
      case "<=" => a <= b
      case ">=" => a >= b
    }
    (l.t, r.t) match {
      case (GVec(_), _) =>
        // any-element semantics (fixture select/filter/compare_operation/
        // greater/vector_int32: a row matches when SOME element satisfies)
        exists(l.col, e => cmp(e, castTo(r, GFloat)))
      case (GText, GText) => cmp(l.col, r.col)
      case (GTime, GText) => cmp(l.col, timeLit(r))
      case (GText, GTime) => cmp(timeLit(l), r.col)
      case (GText, _) => cmp(tryNum(l), r.col.cast("double"))
      case (_, GText) => cmp(l.col.cast("double"), tryNum(r))
      case _ =>
        if (isFloat(l) || isFloat(r)) cmp(l.col.cast("double"), r.col.cast("double"))
        else cmp(l.col.cast("long"), r.col.cast("long"))
    }
  }

  /** Numeric coercion of a text operand that must not raise under ANSI:
    * regex-guarded cast (unparseable text → null → comparison false, the
    * reference's uncastable-operand behavior).
    */
  private def tryNum(v: TVal): Column = {
    val s = v.col.cast("string")
    when(s.rlike("^\\s*-?\\d+(\\.\\d+)?\\s*$"), s.cast("double"))
  }

  /** Parse a Groonga time literal ("YYYY-MM-DD hh:mm:ss[.ffff]") to epoch
    * seconds. Fixtures are authored in JST (the reference CI timezone).
    */
  def parseTime(s0: String): Double = {
    val s = s0.trim.replace('/', '-')
    val (base, frac) = s.indexOf('.') match {
      case -1 => (s, 0.0)
      case i => (s.substring(0, i), ("0." + s.substring(i + 1)).toDouble)
    }
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-M-d H:m[:s]")
    val ldt = java.time.LocalDateTime.parse(base, fmt)
    ldt.atZone(java.time.ZoneId.of("Asia/Tokyo")).toInstant.toEpochMilli / 1000.0 + frac
  }

  private def timeLit(v: TVal): Column = v.litv match {
    case Some(s: String) => lit(parseTime(s))
    case _ => v.col.cast("double")
  }

  /** Store coercion for assignment: wrap to the declared fixed width
    * (reference grn_obj_cast on set_value); floats truncate toward zero
    * into int targets; `_score` is Int32 (command_version 1/2).
    */
  /** Wrap a long value into an N-bit signed/unsigned domain (reference
    * fixed-width column store semantics).
    */
  def wrapInt(c: Column, bits: Int, signed: Boolean): Column =
    if (bits == 64) c
    else {
      val m = lit(1L << bits)
      val base = pmod(c, m)
      if (signed) {
        val half = lit(1L << (bits - 1))
        when(base >= half, base - m).otherwise(base)
      } else base
    }

  private def store(v: TVal, declared: GType, isScore: Boolean): TVal = {
    val target = if (isScore) GInt(32, signed = true) else declared
    target match {
      case GInt(bits, signed) =>
        val asLong = v.t match {
          case GFloat | GTime => v.col.cast("long") // trunc toward zero
          case GText => v.col.cast("double").cast("long")
          case _ => v.col.cast("long")
        }
        TVal(wrapInt(asLong, bits, signed), target)
      case GFloat => TVal(v.col.cast("double"), GFloat)
      case GTime => TVal(v.col.cast("double"), GTime)
      case _ => v
    }
  }

  // ------------------------------------------------- default implementations

  /** Sequential match-family semantics (reference non-indexed exec,
    * lib/expr.c:5367): substring/prefix/suffix/regexp on text (normalizer
    * approximated by lowercasing both sides), element equality on vectors.
    */
  /** Lowercase a regex pattern without touching escape sequences (`\A`
    * must not become the bell `\a`): the reference normalizes pattern and
    * text through the same normalizer before Onigmo sees them.
    */
  def regexLower(pat: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (c == '\\' && i + 1 < pat.length) {
        sb.append(c).append(pat.charAt(i + 1)); i += 2
      } else { sb.append(Character.toLowerCase(c)); i += 1 }
    }
    sb.toString
  }

  def defaultMatch(op: String, l: TVal, r: TVal): TVal = {
    def text1(c: Column): Column = org.apache.spark.sql.functions.lower(c)
    // match-family operators need a constant query (the reference rejects
    // a column-valued rhs, rc=-22; fixture invalid/match/argument/column)
    if (r.litv.isEmpty)
      throw new ScriptError(s"match operator $op needs a constant query")
    val rv = text1(r.col.cast("string"))
    val rpat = r.litv match {
      case Some(s: String) => regexLower(s)
      case _ => ""
    }
    val pred = l.t match {
      case GVec(GText) =>
        op match {
          case "@" => exists(l.col, e => text1(e) === rv)
          case "@^" => exists(l.col, e => text1(e).startsWith(rv))
          case "@$" => exists(l.col, e => text1(e).endsWith(rv))
          case "@~" => exists(l.col, e => text1(e).rlike(rpat))
          case other => throw new ScriptError(s"vector match $other unsupported")
        }
      case GVec(_) => exists(l.col, e => e === r.col)
      case GInt(_, _) | GFloat | GTime if op == "@" =>
        // match on a numeric column = equality (the int index is an exact
        // lookup, reference select/index/match fixtures)
        l.col === r.col.cast(if (l.t == GInt(64, signed = true) ||
          l.t.isInstanceOf[GInt]) "long" else "double")
      case _ =>
        val lv = text1(l.col.cast("string"))
        op match {
          case "@" => contains(lv, rv)
          case "@^" => lv.startsWith(rv)
          case "@$" => lv.endsWith(rv)
          case "@~" => lv.rlike(rpat)
          case other => throw new ScriptError(s"sequential $other needs an index route")
        }
    }
    TVal(coalesce(pred, lit(false)), GBool)
  }

  /** Built-in proc functions usable without an index (reference
    * lib/proc.c registry).
    */
  def defaultCall(name: String, args: Seq[TVal]): Option[TVal] = name match {
    case "all_records" => Some(TVal(lit(true), GBool))
    case "between" if args.size == 5 =>
      val Seq(c, lo0, loB, hi0, hiB) = args
      // Time columns accept text bounds ("YYYY-MM-DD hh:mm:ss") —
      // reference between() casts min/max to the column's type
      // (lib/proc/proc_between.c grn_obj_cast)
      def bound(v: TVal): Column = (c.t, v.t) match {
        case (GTime, GText) => timeLit(v)
        case _ => v.col
      }
      val lo = bound(lo0); val hi = bound(hi0)
      val loOp = if (loB.litv.contains("include")) c.col >= lo else c.col > lo
      val hiOp = if (hiB.litv.contains("include")) c.col <= hi else c.col < hi
      Some(TVal(loOp && hiOp, GBool))
    case "between" if args.size == 3 =>
      val Seq(c, lo0, hi0) = args
      def bound(v: TVal): Column = (c.t, v.t) match {
        case (GTime, GText) => timeLit(v)
        case _ => v.col
      }
      Some(TVal(c.col.between(bound(lo0), bound(hi0)), GBool))
    case "in_values" =>
      val c = args.head
      c.t match {
        case GVec(_) =>
          Some(TVal(arrays_overlap(c.col, array(args.tail.map(_.col): _*)), GBool))
        case _ =>
          Some(TVal(args.tail.map(_.col === c.col).reduce(_ || _), GBool))
      }
    case "max" | "min" if args.isEmpty =>
      // reference: max()/min() without arguments evaluate to 0 (rc stays 0)
      Some(TVal(lit(0L), GInt(32, signed = true), litv = Some(0L)))
    case "max" =>
      val cs = if (args.size == 1) args ++ args else args
      Some(TVal(greatest(cs.map(_.col): _*), args.head.t))
    case "min" =>
      val cs = if (args.size == 1) args ++ args else args
      Some(TVal(least(cs.map(_.col): _*), args.head.t))
    case "vector_size" =>
      Some(TVal(size(args.head.col).cast("long"), GInt(32, signed = false)))
    case "prefix_rk_search" =>
      // romaji/kana prefix over readings (reference
      // grn_pat_prefix_rk_search); vector columns match any element
      val q = args(1).col.cast("string")
      val pred = args.head.t match {
        case GVec(_) =>
          exists(args.head.col, e => call_udf("prefix_rk_search", e.cast("string"), q))
        case _ => call_udf("prefix_rk_search", args.head.col.cast("string"), q)
      }
      Some(TVal(coalesce(pred, lit(false)), GBool))
    case "edit_distance" =>
      // optional 3rd arg with_transposition → Damerau (one-edit adjacent
      // swap), reference lib/proc/proc_edit_distance.c
      val trans = args.lift(2).exists(a =>
        a.litv.exists(v => v == true || v == "true" || v == 1L))
      val d =
        if (trans) call_udf("damerau_levenshtein",
          args(0).col.cast("string"), args(1).col.cast("string"))
        else levenshtein(args(0).col, args(1).col)
      Some(TVal(d.cast("long"), GInt(32, signed = true)))
    case "rand" =>
      Some(TVal((rand() * args.headOption.map(_.col).getOrElse(lit(1))).cast("long"),
        GInt(32, signed = true)))
    case "now" =>
      Some(TVal(unix_timestamp().cast("double"), GTime))
    case _ => None
  }

  /** Positive match (`@`) keywords of a script expression, for the
    * snippet/highlight condition — the analogue of grn_expr_get_keywords
    * (reference lib/expr.c:8003-8040): only OP_MATCH units with a constant
    * query contribute, and units under the NOT side of an AND_NOT (the
    * scan-info `butp` parity walk) are excluded. An unparseable string
    * yields no keywords (the filter itself would have failed first).
    */
  def matchKeywords(src: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(a: Ast, neg: Boolean): Unit = a match {
      case Bin("&!", l, r) => walk(l, neg); walk(r, !neg)
      case Bin("@", _, Str(s)) => if (!neg) out += s
      case Bin(_, l, r) => walk(l, neg); walk(r, neg)
      case Un("!", e) => walk(e, !neg)
      case Un(_, e) => walk(e, neg)
      case Cond(c, t, f) => walk(c, neg); walk(t, neg); walk(f, neg)
      case Comma(es) => es.foreach(walk(_, neg))
      case _ => () // calls (query()/selectors) are OP_CALL units, not OP_MATCH
    }
    try walk(parse(src), neg = false)
    catch { case scala.util.control.NonFatal(_) => () }
    out.toSeq.distinct
  }

  /** False when the expression calls a non-deterministic builtin (`rand`,
    * `now`) anywhere — used by the query cache to bypass caching for
    * script filters, mirroring the Column-side fingerprint deny.
    */
  def isDeterministic(src: String): Boolean = {
    var det = true
    def walk(a: Ast): Unit = a match {
      case CallN(Id("rand" | "now"), _) => det = false
      case CallN(t, args) => walk(t); args.foreach(walk)
      case Bin(_, l, r) => walk(l); walk(r)
      case Un(_, e) => walk(e)
      case Cond(c, t, f) => walk(c); walk(t); walk(f)
      case Comma(es) => es.foreach(walk)
      case Arr(es) => es.foreach(walk)
      case ObjL(fs) => fs.foreach(f => walk(f._2))
      case Member(o, _) => walk(o)
      case IndexOf(o, i) => walk(o); walk(i)
      case AssignN(_, t, v) => walk(t); walk(v)
      case _ => ()
    }
    try walk(parse(src))
    catch { case scala.util.control.NonFatal(_) => det = false }
    det
  }
}
