package graft.query

import graft.index.IndexReader
import graft.search.{Engine, NearMatch, PhraseMatch, ScoredDoc}
import org.apache.spark.sql.{Dataset, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluate a parsed query AST to a scored result set, mirroring
  * grn_table_select's scan-unit evaluation (reference lib/expr.c:6283):
  * match clauses resolve through the inverted index, column predicates
  * filter the docs table (contributing score 1 per matched record, like a
  * non-match scan unit), and boolean structure folds left-to-right through
  * the set algebra (scores add on AND/OR collisions, reference
  * lib/db.c:4195 + res_add lib/ii.c:6029).
  */
object QueryExec {
  import QueryParser._

  def run(reader: IndexReader, q: String,
      matchColumn: Option[String] = None,
      escalationThreshold: Long = -1L): Dataset[ScoredDoc] = {
    val parsed = QueryParser.parse(q)
    val esc = parsed.escalationThreshold.getOrElse(escalationThreshold)
    eval(reader, parsed.root, matchColumn, esc, escalating = true)
  }

  def eval(reader: IndexReader, node: Node,
      matchColumn: Option[String] = None,
      esc: Long = -1L,
      escalating: Boolean = false): Dataset[ScoredDoc] = {
    val spark = reader.spark
    import spark.implicits._
    node match {
      // escalation fires only for OR-merged scan units (reference
      // grn_ii_sel guards on op == GRN_OP_OR) — the first clause and both
      // sides of an OR; never the right side of AND/AND_NOT/ADJUST
      case Match(text, _) if escalating && esc >= 0 =>
        Engine.matchScoresEscalating(reader, text, esc)
      case Match(text, _) => Engine.matchScores(reader, text)
      case Prefix(p) => Engine.prefixSearch(reader, p)
      case Near(text, maxInterval) =>
        Engine.matchScores(reader, text, kind = NearMatch(maxInterval))
      case Similar(text, threshold) =>
        // threshold <= 0 = "use default" (reference
        // DEFAULT_SIMILARITY_THRESHOLD 0); our default profile width is 5
        Engine.similarSearch(reader, text, m = if (threshold > 0) threshold else 5)
      // `col:@word` on the indexed match column routes through the index
      // (the selector-proc index-resolution of reference lib/expr.c:6018)
      case ColPred(colName, "@", value) if matchColumn.contains(colName) =>
        Engine.matchScores(reader, value)
      case ColPred(colName, "^", value) if matchColumn.contains(colName) =>
        Engine.prefixSearch(reader, value)
      case ColPred(colName, op, value) =>
        val d = reader.docs
        val c = col(colName)
        val pred = op match {
          case "" => c === value
          case "!" => c =!= value
          case "<" => c < value
          case ">" => c > value
          case "<=" => c <= value
          case ">=" => c >= value
          // sequential (unindexed) match/prefix/suffix normalize both sides
          // like NormalizerAuto (reference lib/expr.c:5367 sequential exec)
          case "@" => lower(c).contains(value.toLowerCase)
          case "^" => lower(c).startsWith(value.toLowerCase)
          case "$" => lower(c).endsWith(value.toLowerCase)
          case "~" => c.rlike(value)
          case other => throw new IllegalArgumentException(s"unknown op $other")
        }
        d.filter(pred).select(col("docId").as("docId"), lit(1.0).as("score"))
          .as[ScoredDoc]
      case And(l, r) =>
        Engine.SetOps.and(eval(reader, l, matchColumn, esc, escalating),
          eval(reader, r, matchColumn, esc, escalating = false))
      case Or(l, r) =>
        Engine.SetOps.or(eval(reader, l, matchColumn, esc, escalating),
          eval(reader, r, matchColumn, esc, escalating))
      case AndNot(l, r) =>
        Engine.SetOps.andNot(eval(reader, l, matchColumn, esc, escalating),
          eval(reader, r, matchColumn, esc, escalating = false))
      case Adjust(l, r, w) =>
        val rs = eval(reader, r, matchColumn, esc, escalating = false)
          .map(s => ScoredDoc(s.docId, s.score * w))
        Engine.SetOps.adjust(eval(reader, l, matchColumn, esc, escalating), rs)
    }
  }
}
