package graft.command

import graft.SparkTestBase
import graft.index.{IndexBuilder, IndexConfig, IndexReader}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Select-command semantics over a hand-computed micro corpus (TokenDelimit
  * so tf is countable by eye).
  */
class SelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val reader: IndexReader = {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana apple", "f", 10),
      (1L, "banana cherry", "f", 20),
      (2L, "apple cherry date", "g", 30),
      (3L, "date egg fig", "g", 40),
      (4L, "apple apple apple banana", "f", 50)
    ).toDF("docId", "content", "grp", "val")
    val dir = java.nio.file.Files.createTempDirectory("graft_sel_").toString
    IndexBuilder.build(spark, docs, dir, IndexConfig(
      tokenizerName = "TokenDelimit", nShards = 2, buildPartitions = 2,
      hotTermDf = 100000L, nSalts = 2))
    new IndexReader(spark, dir)
  }

  private def hits(p: SelectParams): Seq[(Long, Double)] =
    Select.run(reader, p).hits
      .select(col("_id"), col("_score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("query match scores = tf, default sort by _id") {
    assert(hits(SelectParams(query = Some("apple"),
      outputColumns = Seq("_id", "_score"))) ==
      Seq((0L, 2.0), (2L, 1.0), (4L, 3.0)))
  }

  test("boolean query: apple -banana") {
    assert(hits(SelectParams(query = Some("apple -banana"),
      outputColumns = Seq("_id", "_score"))) == Seq((2L, 1.0)))
  }

  test("OR adds scores on overlap") {
    assert(hits(SelectParams(query = Some("apple OR cherry"),
      outputColumns = Seq("_id", "_score"))) ==
      Seq((0L, 2.0), (1L, 1.0), (2L, 2.0), (4L, 3.0)))
  }

  test("column predicate in query + filter + scorer") {
    // apple AND grp:f => docs 0,4 with score tf+1; scorer doubles it
    assert(hits(SelectParams(query = Some("apple grp:f"),
      scorer = Some("_score * 2"),
      outputColumns = Seq("_id", "_score"))) == Seq((0L, 6.0), (4L, 8.0)))
    // filter param is an AND unit contributing +1
    assert(hits(SelectParams(query = Some("apple"),
      filter = Some(col("val") >= 30),
      outputColumns = Seq("_id", "_score"))) ==
      Seq((2L, 2.0), (4L, 4.0)))
  }

  test("sortby -_score with offset/limit paging") {
    val r = hits(SelectParams(query = Some("apple"),
      sortby = Seq("-_score", "_id"), offset = 1, limit = 1,
      outputColumns = Seq("_id", "_score")))
    assert(r == Seq((0L, 2.0))) // ranking: 4(3.0), 0(2.0), 2(1.0)
  }

  test("nHits counts pre-paging; drilldown aggregates the full hit set") {
    val res = Select.run(reader, SelectParams(query = Some("apple"),
      limit = 1,
      drilldowns = Seq(DrilldownSpec(keys = Seq("grp"),
        calcTypes = Seq("COUNT", "SUM"), calcTarget = Some("val"),
        sortby = Seq("-_nsubrecs")))))
    assert(res.nHits == 3)
    val dd = res.drilldowns("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(dd == Seq(("f", 2L, 60L), ("g", 1L, 30L)))
  }

  test("match escalation: 0-hit exact escalates to prefix expansion") {
    // "appl" is not a token; exact yields 0; UNSPLIT prefix-expands the
    // whole key against the lexicon -> apple docs (reference grn_ii_sel
    // escalation, lib/ii.c:7212). Threshold -1 disables; the DEFAULT is the
    // reference's 0 (escalate only when empty).
    assert(hits(SelectParams(query = Some("appl"),
      matchEscalationThreshold = -1L,
      outputColumns = Seq("_id", "_score"))).isEmpty)
    val esc = hits(SelectParams(query = Some("appl"),
      outputColumns = Seq("_id", "_score")))
    assert(esc.map(_._1) == Seq(0L, 2L, 4L))
    // *E pragma enables it per-query
    val viaPragma = hits(SelectParams(query = Some("*E0 appl"),
      outputColumns = Seq("_id", "_score")))
    assert(viaPragma.map(_._1) == Seq(0L, 2L, 4L))
    // AND right side never escalates
    assert(hits(SelectParams(query = Some("banana +appl"),
      matchEscalationThreshold = 0L,
      outputColumns = Seq("_id", "_score"))).isEmpty)
  }

  test("prefix search via trailing star") {
    // terms starting with 'd': date (docs 2,3)
    assert(hits(SelectParams(query = Some("d*"),
      outputColumns = Seq("_id", "_score"))) == Seq((2L, 1.0), (3L, 1.0)))
  }

  test("snippet_html/highlight_html output columns take keywords from the query") {
    // reference proc_snippet.c:234: the functions carry NO keyword args —
    // keywords come from the select condition (negated terms excluded)
    val res = Select.run(reader, SelectParams(
      query = Some("apple -egg"),
      sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id", "snippet_html(content)", "highlight_html(content)")))
    val rows = res.hits.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L))
    val hl = rows.head.getString(2)
    assert(hl.contains("<span class=\"keyword\">apple</span>"), hl)
    assert(!hl.contains("<span class=\"keyword\">egg"), "negated term tagged")
    val snips = rows.head.getSeq[String](1)
    assert(snips.nonEmpty && snips.head.contains("<span class=\"keyword\">apple</span>"))
    // a no-keyword-occurrence snippet is NULL, not an empty vector
    // (reference proc_snippet envelope); grp never contains 'apple'
    val nul = Select.run(reader, SelectParams(
      query = Some("apple"), sortby = Seq("_id"), limit = 1,
      outputColumns = Seq("_id", "snippet_html(grp)")))
    assert(nul.hits.collect().head.isNullAt(1))
    // an adjust clause is a MATCH scan unit: its term highlights too
    // (reference grn_expr_get_keywords pulls op==GRN_OP_MATCH regardless
    // of the ADJUST logical op)
    val adj = Select.run(reader, SelectParams(
      query = Some("apple >banana"), sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id", "highlight_html(content)")))
    val adjH = adj.hits.collect().head.getString(1)
    assert(adjH.contains("<span class=\"keyword\">banana</span>"), adjH)
    // expanded synonyms highlight too (expansion precedes keyword pull)
    val exp = Select.run(reader, SelectParams(
      query = Some("apple"),
      queryExpander = Some(graft.query.QueryExpander(
        Map("apple" -> "((apple) OR (banana))"))),
      sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id", "highlight_html(content)")))
    val h0 = exp.hits.collect().head.getString(1)
    assert(h0.contains("<span class=\"keyword\">banana</span>"), h0)
  }

  test("script --filter match keywords reach highlight/snippet (merged condition)") {
    // reference builds ONE condition from query AND filter
    // (proc_select.c:726-736); proc_snippet.c:248-287 pulls keywords from
    // that merged condition — a match predicate ONLY in --filter highlights
    val res = Select.run(reader, SelectParams(
      filterScript = Some("""content @ "apple" && val < 40"""),
      sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id", "highlight_html(content)", "snippet_html(content)")))
    val rows = res.hits.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L))
    val hl = rows.head.getString(1)
    assert(hl.contains("<span class=\"keyword\">apple</span>"), hl)
    val snips = rows.head.getSeq[String](2)
    assert(snips.nonEmpty && snips.head.contains("<span class=\"keyword\">apple</span>"))
    // the AND_NOT right side is excluded (grn_expr_get_keywords butp walk)
    val nt = Select.run(reader, SelectParams(
      filterScript = Some("""content @ "apple" &! content @ "banana""""),
      sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id", "highlight_html(content)")))
    val ntRows = nt.hits.collect()
    assert(ntRows.map(_.getLong(0)).toSeq == Seq(2L))
    val nh = ntRows.head.getString(1)
    assert(nh.contains("<span class=\"keyword\">apple</span>") &&
      !nh.contains(">banana</span>"), nh)
    // query AND script-filter keywords merge into one condition
    val both = Select.run(reader, SelectParams(
      query = Some("apple"),
      filterScript = Some("""content @ "cherry""""),
      sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id", "highlight_html(content)")))
    val bRows = both.hits.collect()
    assert(bRows.map(_.getLong(0)).toSeq == Seq(2L))
    val bh = bRows.head.getString(1)
    assert(bh.contains(">apple</span>") && bh.contains(">cherry</span>"), bh)
    // filterScript AND the pre-lowered Column filter combine
    val comb = Select.run(reader, SelectParams(
      filterScript = Some("""content @ "apple""""),
      filter = Some(col("val") >= 30),
      sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id")))
    assert(comb.hits.collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }
}
