package graft.index

import graft.SparkTestBase
import graft.command.{Select, SelectParams}
import graft.query.QueryExec
import org.scalatest.funsuite.AnyFunSuite

/** match_columns multi-section semantics: per-section match, weight
  * multiply, OR score-merge (reference lib/expr.c:6126-6193 +
  * res_add lib/ii.c:6029).
  */
class SectionedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // (docId, title, body)
  private val rows = Seq(
    (0L, "spark guide", "intro to spark and sql engines"),
    (1L, "sql primer", "spark spark spark everywhere"),
    (2L, "other title", "nothing relevant here"),
    (3L, "spark spark", "a body without the s word")
  )

  private lazy val dir = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_sec_").toString
    val df = rows.toDF("docId", "title", "body")
    SectionedIndex.build(spark, df, d,
      IndexConfig(tokenizerName = "TokenDelimit", nShards = 2,
        buildPartitions = 2, hotTermDf = 1000, nSalts = 2),
      sections = Seq("title", "body"))
    d
  }
  private lazy val sidx = SectionedIndex.open(spark, dir)

  test("match_columns spec parser") {
    assert(MatchColumnsSpec.parse("title * 10 || body * 2") ==
      Seq(SectionWeight("title", 10.0), SectionWeight("body", 2.0)))
    assert(MatchColumnsSpec.parse("content") == Seq(SectionWeight("content", 1.0)))
  }

  test("weighted multi-section match: scores = sum over sections of w*tf") {
    val spec = Seq(SectionWeight("title", 10.0), SectionWeight("body", 2.0))
    val got = QueryExec.runSectioned(sidx, "spark", spec)
      .collect().map(s => s.docId -> s.score).toMap
    // doc0: title tf1*10 + body tf1*2 = 12; doc1: body tf3*2 = 6;
    // doc3: title tf2*10 = 20; doc2: no match
    assert(got == Map(0L -> 12.0, 1L -> 6.0, 3L -> 20.0))
  }

  test("col:@word routes to that column's own index section") {
    val spec = Seq(SectionWeight("title", 1.0))
    val got = QueryExec.runSectioned(sidx, "body:@spark", spec)
      .collect().map(s => s.docId -> s.score).toMap
    assert(got == Map(0L -> 1.0, 1L -> 3.0)) // body tf only, weight 1
  }

  test("select over sectioned index sorts by weighted _score") {
    val res = Select.run(sidx, SelectParams(
      query = Some("spark"),
      matchColumns = Seq("title * 10", "body * 2"),
      sortby = Seq("-_score", "_id"),
      outputColumns = Seq("_id", "_score"),
      limit = 10))
    val hits = res.hits.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.toSeq == Seq((3L, 20.0), (0L, 12.0), (1L, 6.0)))
    assert(res.nHits == 3)
  }

  test("primary section docs table keeps all metadata columns") {
    assert(sidx.docs.columns.toSet.contains("body"))
    assert(sidx.docs.columns.toSet.contains("title"))
  }
}
