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
      matchColumn: Option[String] = None): Dataset[ScoredDoc] = {
    val parsed = QueryParser.parse(q)
    eval(reader, parsed.root, matchColumn)
  }

  def eval(reader: IndexReader, node: Node,
      matchColumn: Option[String] = None): Dataset[ScoredDoc] = {
    val spark = reader.spark
    import spark.implicits._
    node match {
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
        Engine.SetOps.and(eval(reader, l, matchColumn), eval(reader, r, matchColumn))
      case Or(l, r) =>
        Engine.SetOps.or(eval(reader, l, matchColumn), eval(reader, r, matchColumn))
      case AndNot(l, r) =>
        Engine.SetOps.andNot(eval(reader, l, matchColumn), eval(reader, r, matchColumn))
      case Adjust(l, r, w) =>
        val rs = eval(reader, r, matchColumn).map(s => ScoredDoc(s.docId, s.score * w))
        Engine.SetOps.adjust(eval(reader, l, matchColumn), rs)
    }
  }
}
