package graft.search

import graft.index.IndexReader
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Index-assisted regular-expression search — the Spark re-expression of
  * Groonga's TokenRegexp path (reference grn_ii_select_regexp lib/ii.c:6502
  * over a 2-gram index; index-searchability check lib/expr.c:4322-4411):
  *
  *   1. a "simple" pattern's MANDATORY literal runs are extracted
  *      ([[literals]] — conservative: any alternation/group/class/backslash
  *      construct disqualifies, exactly the spirit of the reference's
  *      regexp_is_searchable check);
  *   2. each literal phrase-matches against a RAW overlapping-bigram index
  *      (`TokenBigram:none` — every 2-char substring is a term, so a literal
  *      of length >= 2 decomposes into consecutive bigrams and phrase
  *      alignment == substring occurrence: a sound, complete prefilter);
  *   3. surviving candidates verify with Catalyst `rlike` on the source
  *      column (the scan is pruned to candidates — O(matches), not O(corpus));
  *   4. non-simple patterns fall back to the distributed sequential rlike
  *      scan, like the reference's sequential path (lib/ii.c:6536).
  */
object RegexSearch {

  /** Mandatory literal runs of a simple pattern; None = not index-assistable. */
  def literals(pattern: String): Option[Seq[String]] = {
    val runs = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    def endRun(): Unit = { if (cur.length >= 2) runs += cur.toString; cur.clear() }
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '(' | ')' | '[' | ']' | '{' | '}' | '|' | '\\' =>
          return None // groups/classes/alternation/escapes: fall back to scan
        case '*' | '?' =>
          // previous char optional: not mandatory — drop it, end the run
          if (cur.nonEmpty) cur.setLength(cur.length - 1)
          endRun()
        case '+' =>
          endRun() // char is mandatory (already in run) but repetition breaks adjacency
        case '.' | '^' | '$' =>
          endRun()
        case c =>
          cur.append(c)
      }
      i += 1
    }
    endRun()
    Some(runs.toSeq)
  }

  /** Regexp match over `docsReader.docs(colName)`, prefiltered through the
    * raw-bigram index `ngram` when the pattern allows. Returns docIds with
    * score 1 (presence semantics, like the reference's regexp operator).
    */
  def regexpSearch(
      docsReader: IndexReader,
      ngram: Option[IndexReader],
      pattern: String,
      colName: String = "content"
  ): Dataset[ScoredDoc] = {
    val spark = docsReader.spark
    import spark.implicits._
    // liveDocs, not docs: the Deletes contract (every query path subtracts
    // the tombstone set) applies to both the scan and the candidate verify
    val docs = docsReader.liveDocs

    def seqScan: Dataset[ScoredDoc] =
      docs.filter(col(colName).rlike(pattern))
        .select(col("docId"), lit(1.0).as("score")).as[ScoredDoc]

    (ngram, literals(pattern)) match {
      case (Some(ng), Some(ls)) if ls.nonEmpty =>
        val candidates = ls.map(l => Engine.matchScores(ng, l))
          .reduce(Engine.SetOps.and)
          .select("docId")
        docs.join(candidates, "docId")
          .filter(col(colName).rlike(pattern))
          .select(col("docId"), lit(1.0).as("score")).as[ScoredDoc]
      case _ => seqScan
    }
  }
}
