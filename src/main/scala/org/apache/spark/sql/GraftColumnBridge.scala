package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, ScalaUDF}
import org.apache.spark.sql.expressions.SparkUserDefinedFunction
import org.apache.spark.sql.internal.{InvokeInlineUserDefinedFunction, UnresolvedAttribute, UnresolvedFunction}

/** Bridge into the sql-private side of [[Column]].
  *
  * Spark 4 made Column node-based: `Column.node` and the node→Catalyst
  * converter are `private[sql]`, and conversion is LAZY (the node reaches
  * Catalyst only at analysis), so a library cannot see through a Column's
  * toString from outside this package. The graft query cache needs exactly
  * that: Column.toString renders every UDF identically ("UDF(args)"), so
  * two different UDF filters would share a cache key — a wrong-results
  * false HIT. This shim lives in org.apache.spark.sql purely to cross the
  * access boundary; it adds no behavior.
  */
object GraftColumnBridge {

  /** Builtin functions whose value varies run-to-run (or query-to-query):
    * a select whose parameters call one of these must never be served from
    * cache. Matched by name on UNRESOLVED nodes, so arity can't be checked
    * — e.g. unix_timestamp(col) is deterministic but blocked too; a false
    * "not cacheable" only costs the cache, never correctness.
    */
  private val nondeterministicNames = Set(
    "rand", "randn", "random", "uuid", "shuffle", "randstr", "uniform",
    "monotonically_increasing_id", "spark_partition_id", "input_file_name",
    "input_file_block_start", "input_file_block_length",
    "now", "current_timestamp", "current_date", "curdate", "localtimestamp",
    "current_time", "unix_timestamp",
    // session-scoped constants: stable within a session but the cache can
    // outlive/a span sessions, so treat as non-cacheable too
    "current_database", "current_schema", "current_catalog",
    "current_user", "session_user", "user", "current_timezone")

  /** Names the analyzer resolves as PAREN-LESS literal functions when no
    * column matches (LiteralFunctionResolution — Spark 4.1.2 resolves
    * current_date/current_timestamp/current_time/current_user/user/
    * session_user this way; localtimestamp kept for forward-compat, it
    * only over-denies): a bare `current_date` identifier parses as
    * UnresolvedAttribute, not UnresolvedFunction, so the function
    * deny-list above never sees it. Matching attribute NAMES against this
    * set closes the hole. Column resolution takes PRECEDENCE over literal
    * functions in the analyzer, so when the caller supplies the in-scope
    * column names the deny is skipped for real columns — a select over a
    * doc column named `user` is deterministic and stays cacheable.
    */
  private val literalFunctionNames = Set(
    "current_date", "current_timestamp", "current_time", "localtimestamp",
    "current_user", "session_user", "user")

  /** The UDF function objects embedded anywhere in `c`'s node tree, in
    * visit order — identity-significant: the same UserDefinedFunction
    * applied twice yields the same objects, a different lambda different
    * ones. None when the tree is NOT CACHEABLE (a non-deterministic
    * builtin or UDF anywhere in it).
    *
    * @param knownColumns names of the columns in scope where this Column
    *   will resolve; a bare attribute matching one resolves as that
    *   column, never as a literal function, so it is not denied. Matching
    *   honors `caseSensitive` (spark.sql.caseSensitive): case-insensitive
    *   by default (pass lowercased names), EXACT when the session is
    *   case-sensitive — there a docs column `USER` does NOT shadow a bare
    *   `user` reference, which the analyzer then resolves as the
    *   session_user literal function.
    */
  def udfIdentities(
      c: Column, knownColumns: Set[String] = Set.empty,
      caseSensitive: Boolean = false): Option[Seq[AnyRef]] = {
    val out = Seq.newBuilder[AnyRef]
    var cacheable = true
    def shadowedByColumn(name: String): Boolean =
      if (caseSensitive) knownColumns(name)
      else knownColumns(name.toLowerCase)
    def visit(x: Any): Unit = x match {
      case fn: UnresolvedFunction =>
        if (nondeterministicNames(fn.functionName.toLowerCase)) cacheable = false
        fn.arguments.foreach(visit)
      case u: InvokeInlineUserDefinedFunction =>
        u.function match {
          case s: SparkUserDefinedFunction =>
            if (!s.deterministic) cacheable = false
            out += s.f.asInstanceOf[AnyRef]
          case other => out += other.asInstanceOf[AnyRef]
        }
        u.arguments.foreach(visit)
      case e: ScalaUDF =>
        if (!e.udfDeterministic) cacheable = false
        out += e.function
        e.children.foreach(visit)
      case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        // parsed-but-unanalyzed trees (expr("rand()")): the catalyst
        // UnresolvedFunction reports deterministic=true until resolution,
        // so match by name like the node-side twin above
        if (nondeterministicNames(uf.nameParts.last.toLowerCase)) cacheable = false
        uf.children.foreach(visit)
      case ua: UnresolvedAttribute =>
        // bare `current_date` (no parens) parses as an ATTRIBUTE; when no
        // such column exists the analyzer resolves it as a literal function
        // at execution time — block by name (see literalFunctionNames)
        // UNLESS a real in-scope column carries the name (column wins)
        if (ua.nameParts.lengthCompare(1) == 0 &&
          literalFunctionNames(ua.nameParts.head.toLowerCase) &&
          !shadowedByColumn(ua.nameParts.head)) cacheable = false
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        if (ua.nameParts.lengthCompare(1) == 0 &&
          literalFunctionNames(ua.nameParts.head.toLowerCase) &&
          !shadowedByColumn(ua.nameParts.head)) cacheable = false
      case s: org.apache.spark.sql.internal.SqlExpression =>
        // a raw SQL fragment is opaque until parsed — parse it (cheap,
        // string-sized) so rand()/uuid() inside expr("...") are seen;
        // unparseable fragments are conservatively not cacheable
        try visit(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(s.expression))
        catch { case scala.util.control.NonFatal(_) => cacheable = false }
      case e: Expression =>
        // deterministic is tree-recursive on RESOLVED trees; on unresolved
        // ones keep walking children ourselves (covers ExpressionColumnNode
        // wrappers built straight from Catalyst)
        if (!e.deterministic) cacheable = false
        e.children.foreach(visit)
      case s: Iterable[_] => s.foreach(visit)
      case o: Option[_] => o.foreach(visit)
      case p: Product => p.productIterator.foreach(visit)
      case _ =>
    }
    visit(c.node)
    if (cacheable) Some(out.result()) else None
  }
}
