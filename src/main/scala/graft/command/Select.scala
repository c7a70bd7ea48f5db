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
    /** `--filter` as Groonga SCRIPT-SYNTAX text, lowered against the docs
      * schema via [[graft.script.ScriptExpr]] and AND-combined with
      * `filter` when both are present. Unlike the pre-lowered Column form,
      * the parsed text also contributes its match (`@`) keywords to the
      * snippet/highlight condition — the reference builds ONE condition
      * expression from query AND filter (proc_select.c:726-736) and
      * proc_snippet.c:248-287 pulls keywords from that merged condition.
      */
    filterScript: Option[String] = None,
    scorer: Option[String] = None,
    sortby: Seq[String] = Seq("_id"),
    offset: Int = 0,
    limit: Int = 10,
    outputColumns: Seq[String] = Seq("*"),
    drilldowns: Seq[DrilldownSpec] = Nil,
    /** `--adjuster 'col @ "value" * factor + ...'`: additive score boost for
      * result-set members matching each clause (reference
      * proc_select.c:125-196, OP_ADJUST with the factor as weight).
      */
    adjuster: Option[String] = None,
    /** Reference default 0 (GRN_DEFAULT_MATCH_ESCALATION_THRESHOLD):
      * escalate EXACT→UNSPLIT→PARTIAL only when a match comes back empty;
      * -1 disables escalation entirely.
      */
    matchEscalationThreshold: Long = 0L,
    /** Filter-stage score column (reference res_add: each satisfied filter
      * predicate contributes its match weight); default 1 per row.
      */
    filterScore: Option[Column] = None,
    /** Scorer-stage column assignments in order — the general
      * `--scorer 'col op= expr'` form (assignments update named columns,
      * not just `_score`). Applied after `scorer`.
      */
    scorerAssigns: Seq[(String, Column)] = Nil,
    /** Pre-lowered output columns (name, expr); takes precedence over
      * `outputColumns` when set.
      */
    outputExprs: Option[Seq[(String, Column)]] = None,
    /** Pre-lowered sort keys; takes precedence over `sortby` when set. */
    sortByCols: Option[Seq[Column]] = None,
    /** `--query_flags` (reference grn_proc_expr_query_flags): which query
      * syntax classes the parser honors; NONE demotes `col:v`/pragmas to
      * plain text, ALLOW_LEADING_NOT permits a query-initial `-term`.
      */
    queryFlags: graft.query.QueryParser.QueryFlags =
      graft.query.QueryParser.QueryFlags.default,
    /** `--query_expander TABLE.COLUMN` (reference proc_select.c:34-58):
      * synonym substitution over the raw `query` string before parsing —
      * see [[graft.query.QueryExpander]]. Applied (and cleared) up front,
      * so downstream — including the query cache, which then keys on the
      * fully-expanded deterministic string — never sees the expander.
      */
    queryExpander: Option[graft.query.QueryExpander] = None
)

final case class SelectResult(
    nHits: Long,
    hits: DataFrame,
    drilldowns: Map[String, DataFrame],
    /** Total group count per drilldown (pre-offset/limit) — the envelope's
      * leading count for each drilldown result set.
      */
    drilldownTotals: Map[String, Long] = Map.empty
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
    val (neg, body) =
      if (k.startsWith("-")) (true, k.drop(1)) else (false, k.stripPrefix("+"))
    // expression sort keys (e.g. `geo_distance(location, "...")`) evaluate
    // through Catalyst, like the reference's expression sort keys
    // (grn_table_sort_key_from_str, lib/db.c:12354)
    val c = if (body.contains('(')) expr(body) else col(colOf(body))
    if (neg) c.desc else c.asc
  }

  /** [[run]] through the query-result cache: repeated identical selects on
    * an unchanged index skip job submission entirely (see [[QueryCache]];
    * reference grn_cache, lib/proc/proc_select.c:571-657). Use on the
    * serving path — results materialize on the driver, which is exactly
    * the offset/limit-bounded page the command returns anyway.
    */
  def runCached(reader: IndexReader, p0: SelectParams): SelectResult = {
    val p = preExpand(p0) // cache keys on the expanded (deterministic) query
    QueryCache.fetch(reader, p)(run(reader, p))
  }

  /** Apply `--query_expander` to the raw query string and drop the expander
    * from the params (reference order: expansion precedes parsing,
    * proc_select.c:34-58). Idempotent: a params value with no expander
    * passes through.
    */
  private def preExpand(p: SelectParams): SelectParams = p.queryExpander match {
    case Some(e) =>
      p.copy(query = p.query.map(e.expand(_, p.queryFlags)), queryExpander = None)
    case None => p
  }

  def run(reader: IndexReader, p0: SelectParams): SelectResult = {
    val p = preExpand(p0)
    // the single match column may carry a weight or scorer cap
    // ("title * 10", "scorer_tf_at_most(col, 3.0)")
    val sw = p.matchColumns.headOption
      .map(mc => graft.index.MatchColumnsSpec.parse(mc).headOption
        .getOrElse(graft.index.SectionWeight(mc, 1.0)))
    runWith(reader.liveDocs,
      q => QueryExec.run(reader, q, sw.map(_.column),
        p.matchEscalationThreshold,
        weight = sw.map(_.weight).getOrElse(1.0),
        cap = sw.flatMap(_.cap),
        tfIdf = sw.exists(_.tfIdf),
        flags = p.queryFlags).toDF("docId", "_score"),
      p,
      // single-index mode: every adjuster clause resolves to the one index
      // (the caller is responsible for it covering the clause's column)
      adjust = p.adjuster.map(spec => applyAdjuster(_ => reader, spec, _)))
  }

  /** Parse and apply an adjuster spec against `scored` (docId, _score):
    * each `col @ "value" * factor` clause contributes factor*tf for member
    * docs, matched against THAT column's index (reference proc_select.c:125
    * resolves the clause target through the column's index); clauses combine
    * additively (OP_ADJUST accumulation).
    */
  private val adjusterClause =
    """\s*([\w.]+)\s*@\s*"([^"]*)"(?:\s*\*\s*(\d+(?:\.\d+)?))?\s*""".r

  private def applyAdjuster(byCol: String => IndexReader, spec: String, scored: DataFrame): DataFrame = {
    // split on + outside quotes
    val parts = spec.split("""\+(?=(?:[^"]*"[^"]*")*[^"]*$)""").toSeq
    val boosts = parts.map {
      case adjusterClause(colName, value, factor) =>
        graft.search.Engine.matchScores(byCol(colName), value,
          weight = Option(factor).map(_.toDouble).getOrElse(1.0))
      case other => throw new IllegalArgumentException(s"bad adjuster clause: $other")
    }
    val boost = boosts.reduce(graft.search.Engine.SetOps.or)
      .toDF("docId", "_boost")
    scored.join(boost, Seq("docId"), "left_outer")
      .select(col("docId"),
        (col("_score") + coalesce(col("_boost"), lit(0.0))).as("_score"))
  }

  /** Sectioned variant: bare query terms match every section of
    * `p.matchColumns` (entries may carry weights, `"title * 10"`), scores
    * weighted then merged — the full `--match_columns` semantics.
    */
  def run(sidx: graft.index.SectionedReader, p0: SelectParams,
      docsOverride: Option[DataFrame] = None): SelectResult = {
    val p = preExpand(p0)
    val spec = graft.index.MatchColumnsSpec.parse(p.matchColumns.mkString(" || "))
    runWith(docsOverride.getOrElse(sidx.primary.liveDocs),
      q => QueryExec.runSectioned(sidx, q, spec,
        p.matchEscalationThreshold, flags = p.queryFlags).toDF("docId", "_score"),
      p,
      adjust = p.adjuster.map { sp => (scored: DataFrame) =>
        // adjuster clauses name their target column → that section's index;
        // error when no index section exists for it (reference behavior:
        // an adjuster needs the column's index)
        applyAdjuster(c => sidx.readers.getOrElse(c,
          throw new IllegalArgumentException(
            s"adjuster column $c has no index section (have: ${sidx.sectionNames.mkString(",")})")),
          sp, scored)
      })
  }

  private def runWith(
      docs: DataFrame,
      queryEval: String => DataFrame,
      p: SelectParams,
      adjust: Option[DataFrame => DataFrame] = None
  ): SelectResult = {
    // 1. result set: query (via index) AND filter (via Catalyst), like the
    // AND-combined condition of grn_select step 2 (proc_select.c:726-739)
    val fScore = p.filterScore.getOrElse(lit(1.0))
    // script-syntax filter text lowers against the docs schema; combined
    // AND with the pre-lowered Column form when both are given (the
    // reference AND-combines every condition source, proc_select.c:726)
    val scriptFilter: Option[Column] = p.filterScript.map { src =>
      val v = graft.script.ScriptExpr.lower(
        src, new graft.script.DataFrameEnv(docs.schema)).value
      v.bool.getOrElse(v.col).cast("boolean")
    }
    val effFilter: Option[Column] = (p.filter, scriptFilter) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (a, b) => a.orElse(b)
    }
    val scored: DataFrame = (p.query, effFilter) match {
      case (Some(q), None) =>
        queryEval(q)
      case (None, Some(f)) =>
        docs.filter(f).select(col("docId"), fScore.cast("double").as("_score"))
      case (Some(q), Some(f)) =>
        // filter applies as an AND scan unit: intersect, scores add
        queryEval(q)
          .join(docs.filter(f).select(col("docId"),
            fScore.cast("double").as("_fscore")), "docId")
          .withColumn("_score", col("_score") + col("_fscore"))
          .drop("_fscore")
      case (None, None) =>
        docs.select(col("docId"), lit(1.0).as("_score"))
    }

    // 1b. adjuster (reference grn_select step 4, before the scorer)
    val adjusted = adjust.map(f => f(scored)).getOrElse(scored)

    val hitsAll = adjusted.join(docs, "docId")
    val nHits = hitsAll.count()

    // 2. scorer expression (`--scorer "_score = expr"`) + general column
    // assignments (`--scorer 'output &= value'`), applied in order
    val scoredHits0 = p.scorer match {
      case Some(e) => hitsAll.withColumn("_score", expr(e))
      case None => hitsAll
    }
    val scoredHits = p.scorerAssigns.foldLeft(scoredHits0) {
      case (d, (name, c)) => d.withColumn(name, c)
    }

    // 3. sort + offset/limit: TakeOrdered over offset+limit, then drop the
    // offset rows (partial sort, reference grn_table_sort lib/db.c:11176)
    val order = p.sortByCols.getOrElse(
      sortCols(if (p.sortby.nonEmpty) p.sortby else Seq("_id")))
    // negative offset/limit count from the end (reference
    // grn_normalize_offset_and_limit: offset += size; limit += size + 1)
    val offset = math.max(0L,
      if (p.offset < 0) nHits + p.offset else p.offset.toLong).toInt
    val limit = math.max(0L, math.min(Int.MaxValue.toLong,
      if (p.limit < 0) nHits + p.limit + 1 else p.limit.toLong)).toInt
    val paged =
      if (offset == 0) scoredHits.orderBy(order: _*).limit(limit)
      else scoredHits.orderBy(order: _*).offset(offset).limit(limit)

    // 4. output columns (pseudo-cols _id/_score; function-call entries are
    // Catalyst expressions — the reference's output_columns script exprs,
    // lib/output.c:2187). snippet_html/highlight_html take their keywords
    // from the select CONDITION, not from arguments (reference
    // proc_snippet.c:234), so they resolve here against p.query rather
    // than through the session function registry.
    // the reference merges query AND filter into one condition and pulls
    // keywords from both (proc_select.c:726-736 + proc_snippet.c:248-287):
    // positive `@` matches in the script filter contribute too
    lazy val condKeywords: Seq[String] =
      (p.query.toSeq.flatMap(q =>
        graft.query.QueryParser.matchKeywords(q, p.queryFlags)) ++
        p.filterScript.toSeq.flatMap(graft.script.ScriptExpr.matchKeywords))
        .distinct
    val condFn = """\s*(snippet_html|highlight_html)\(\s*([\w.]+)\s*\)\s*""".r
    def outCol(c: String): Column = c match {
      case condFn("snippet_html", target) =>
        graft.functions.TextFunctions.snippetHtml(col(colOf(target)), condKeywords)
      case condFn("highlight_html", target) =>
        graft.functions.TextFunctions.highlightHtml(col(colOf(target)), condKeywords)
      case _ => if (c.contains('(')) expr(c) else col(colOf(c))
    }
    val out = p.outputExprs match {
      case Some(es) => paged.select(es.map { case (n, c) => c.as(n) }: _*)
      case None =>
        if (p.outputColumns == Seq("*")) paged
        else paged.select(p.outputColumns.map(c => outCol(c).as(c)): _*)
    }

    // 5. drilldowns evaluate on the FILTERED set (pre-offset/limit)
    val dds = p.drilldowns.map { d =>
      val label = if (d.label.nonEmpty) d.label else d.keys.mkString(",")
      // vector (array) keys group per ELEMENT — reference grn_table_group
      // unnests vector key values into the group table (lib/db.c:3483)
      val base = d.keys.foldLeft(hitsAll) { (df, k) =>
        df.schema.fields.find(_.name == k) match {
          case Some(f) if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
            df.withColumn(k, explode(col(k)))
          case _ => df
        }
      }
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
      // group insertion order (reference group-hash insertion follows the
      // _id scan order) — backs the drilldown `_id` sort key; LAST so the
      // calc columns keep their positional slots
      aggs += min(col("docId")).as("__first")
      val grouped = base.groupBy(d.keys.map(col): _*)
        .agg(aggs.head, aggs.tail.toSeq: _*)
      // drilldown sort keys: `_id` = insertion order, `_key` = the
      // (composite) group key, `_value.<k>(._key)?` = one key component
      def ddSort(raw: String): Seq[Column] = {
        val (neg, body) =
          if (raw.startsWith("-")) (true, raw.drop(1))
          else (false, raw.stripPrefix("+"))
        val cols: Seq[Column] = body match {
          case "_id" | "__first" => Seq(col("__first"))
          case "_key" => d.keys.map(col)
          case b if b.startsWith("_value.") =>
            Seq(col(b.stripPrefix("_value.").stripSuffix("._key")))
          case b => Seq(col(b))
        }
        cols.map(c => if (neg) c.desc else c.asc)
      }
      // ties break in group INSERTION order (__first), the reference's
      // group-hash id order; keys keep exploded-vector groups deterministic
      val sorted0 = grouped.orderBy(
        d.sortby.flatMap(ddSort) ++ Seq(asc("__first")) ++ d.keys.map(asc): _*)
      // negative offset/limit normalize against the group count
      // (reference grn_normalize_offset_and_limit)
      val total = grouped.count()
      val off = math.max(0L,
        if (d.offset < 0) total + d.offset else d.offset.toLong).toInt
      val lim = math.max(0L, math.min(Int.MaxValue.toLong,
        if (d.limit < 0) total + d.limit + 1 else d.limit.toLong)).toInt
      val sorted =
        if (off == 0) sorted0.limit(lim) else sorted0.offset(off).limit(lim)
      (label, sorted, total)
    }

    SelectResult(nHits, out, dds.map(t => t._1 -> t._2).toMap,
      dds.map(t => t._1 -> t._3).toMap)
  }
}
