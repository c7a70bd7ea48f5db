package graft.command

import graft.index.IndexReader
import graft.query.QueryExec
import graft.search.ScoredDoc
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One drilldown (facet) over the hit set — reference
  * grn_select_drilldown / drilldown_labeled (lib/proc/proc_select.c:358-528):
  * group by `keys`, always emit `_nsubrecs` (count), plus `_sum/_min/_max/
  * _avg` of `calcTarget` per `calcTypes`.
  */
final case class DrilldownSpec(
    keys: Seq[String],
    calcTypes: Seq[String] = Seq("COUNT"),
    calcTarget: Option[String] = None,
    sortby: Seq[String] = Seq("-_nsubrecs"),
    offset: Int = 0,
    limit: Int = 10,
    label: String = ""
)

/** Parameters of the `select` command (reference grn_select,
  * lib/proc/proc_select.c:530: query / filter / scorer / sortby / output /
  * drilldown stages in that order).
  *
  * `filter` is a Catalyst Column over the docs table — the script-syntax
  * expression VM of the reference (lib/expr.c:2437) is Catalyst here, so
  * filters are written as Column expressions directly.
  * `scorer` is a SQL expression over `_score` and doc columns, the
  * equivalent of `--scorer '_score = <expr>'` (proc_select.c:802-826).
  */
final case class SelectParams(
    query: Option[String] = None,
    matchColumns: Seq[String] = Seq("content"),
    filter: Option[Column] = None,
    scorer: Option[String] = None,
    sortby: Seq[String] = Seq("_id"),
    offset: Int = 0,
    limit: Int = 10,
    outputColumns: Seq[String] = Seq("*"),
    drilldowns: Seq[DrilldownSpec] = Nil,
    matchEscalationThreshold: Long = -1L
)

final case class SelectResult(
    nHits: Long,
    hits: DataFrame,
    drilldowns: Map[String, DataFrame]
)

object Select {

  /** Pseudo-column mapping: _id = docId, _score = score. `_key` maps to the
    * docs table's natural key column when present (doc_id passthrough).
    */
  private def colOf(name: String): String = name match {
    case "_id" => "docId"
    case "_score" => "_score"
    case other => other
  }

  private def sortCols(keys: Seq[String]): Seq[Column] = keys.map { k =>
    if (k.startsWith("-")) desc(colOf(k.drop(1))) else asc(colOf(k.stripPrefix("+")))
  }

  def run(reader: IndexReader, p: SelectParams): SelectResult =
    runWith(reader.liveDocs,
      q => QueryExec.run(reader, q, p.matchColumns.headOption,
        p.matchEscalationThreshold).toDF("docId", "_score"),
      p)

  /** Sectioned variant: bare query terms match every section of
    * `p.matchColumns` (entries may carry weights, `"title * 10"`), scores
    * weighted then merged — the full `--match_columns` semantics.
    */
  def run(sidx: graft.index.SectionedReader, p: SelectParams): SelectResult = {
    val spec = graft.index.MatchColumnsSpec.parse(p.matchColumns.mkString(" || "))
    runWith(sidx.primary.liveDocs,
      q => QueryExec.runSectioned(sidx, q, spec,
        p.matchEscalationThreshold).toDF("docId", "_score"),
      p)
  }

  private def runWith(docs: DataFrame, queryEval: String => DataFrame, p: SelectParams): SelectResult = {
    // 1. result set: query (via index) AND filter (via Catalyst), like the
    // AND-combined condition of grn_select step 2 (proc_select.c:726-739)
    val scored: DataFrame = (p.query, p.filter) match {
      case (Some(q), None) =>
        queryEval(q)
      case (None, Some(f)) =>
        docs.filter(f).select(col("docId"), lit(1.0).as("_score"))
      case (Some(q), Some(f)) =>
        // filter applies as an AND scan unit: intersect, scores add 1
        queryEval(q)
          .join(docs.filter(f).select(col("docId")), "docId")
          .withColumn("_score", col("_score") + 1.0)
      case (None, None) =>
        docs.select(col("docId"), lit(1.0).as("_score"))
    }

    val hitsAll = scored.join(docs, "docId")
    val nHits = hitsAll.count()

    // 2. scorer expression (`--scorer "_score = expr"`)
    val scoredHits = p.scorer match {
      case Some(e) => hitsAll.withColumn("_score", expr(e))
      case None => hitsAll
    }

    // 3. sort + offset/limit: TakeOrdered over offset+limit, then drop the
    // offset rows (partial sort, reference grn_table_sort lib/db.c:11176)
    val order = sortCols(if (p.sortby.nonEmpty) p.sortby else Seq("_id"))
    val paged =
      if (p.offset == 0) scoredHits.orderBy(order: _*).limit(p.limit)
      else scoredHits.orderBy(order: _*).offset(p.offset).limit(p.limit)

    // 4. output columns (pseudo-cols _id/_score supported)
    val out =
      if (p.outputColumns == Seq("*")) paged
      else paged.select(p.outputColumns.map(c => col(colOf(c)).as(c)): _*)

    // 5. drilldowns evaluate on the FILTERED set (pre-offset/limit)
    val dds = p.drilldowns.zipWithIndex.map { case (d, idx) =>
      val label = if (d.label.nonEmpty) d.label else d.keys.mkString(",")
      val aggs = scala.collection.mutable.ArrayBuffer[Column]()
      aggs += count(lit(1)).as("_nsubrecs")
      d.calcTypes.filter(_ != "COUNT").foreach { ct =>
        val t = col(d.calcTarget.getOrElse(
          throw new IllegalArgumentException("calc_target required")))
        ct match {
          case "SUM" => aggs += sum(t).as("_sum")
          case "MIN" => aggs += min(t).as("_min")
          case "MAX" => aggs += max(t).as("_max")
          case "AVG" => aggs += avg(t).as("_avg")
          case other => throw new IllegalArgumentException(s"calc type $other")
        }
      }
      val grouped = hitsAll.groupBy(d.keys.map(col): _*)
        .agg(aggs.head, aggs.tail.toSeq: _*)
      val sorted = grouped.orderBy(
        d.sortby.map(k =>
          if (k.startsWith("-")) desc(k.drop(1)) else asc(k.stripPrefix("+"))) ++
          d.keys.map(asc): _*) // key tie-break for determinism
        .limit(d.offset + d.limit)
      label -> sorted
    }.toMap

    SelectResult(nHits, out, dds)
  }
}
