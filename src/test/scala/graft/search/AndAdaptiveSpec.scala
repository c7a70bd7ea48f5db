package graft.search

import graft.SparkTestBase
import graft.index.{IndexBuilder, IndexConfig, IndexReader}
import org.scalatest.funsuite.AnyFunSuite

/** The too-many-matches AND escape: when one operand's df dwarfs the
  * other's, the hot postings are never decoded — candidates verify against
  * the source column. Results must be identical to the pure index path.
  */
class AndAdaptiveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val reader: IndexReader = {
    import spark.implicits._
    // "the" is hot (every doc, several occurrences); "fig"/"kiwi" are rare
    val docs = (0L until 60L).map { i =>
      val rare = if (i % 20 == 3) " fig" else if (i % 20 == 7) " kiwi fig" else ""
      (i, s"the quick the lazy word$i the end$rare")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_aa_").toString
    IndexBuilder.build(spark, docs.toDF("docId", "content"), dir,
      IndexConfig(tokenizerName = "TokenDelimit", nShards = 2,
        buildPartitions = 2, hotTermDf = 100000L, nSalts = 2))
    new IndexReader(spark, dir)
  }

  private def scoresOf(ds: org.apache.spark.sql.Dataset[ScoredDoc]): Map[Long, Double] =
    ds.collect().map(s => s.docId -> s.score).toMap

  test("scan-verify path == index AND (hot term never decoded)") {
    val idx = scoresOf(Engine.SetOps.and(
      Engine.matchScores(reader, "fig"), Engine.matchScores(reader, "the")))
    // ratio 1: df(the)=60 > 1×df(fig)=6 forces the scan-verify path
    val adaptive = scoresOf(Engine.andAdaptive(reader, "fig", "the", ratio = 1.0))
    assert(idx.nonEmpty && adaptive == idx)
    // argument order must not matter
    assert(scoresOf(Engine.andAdaptive(reader, "the", "fig", ratio = 1.0)) == idx)
  }

  test("below the ratio both operands stay on the index path, same result") {
    val idx = scoresOf(Engine.SetOps.and(
      Engine.matchScores(reader, "fig"), Engine.matchScores(reader, "kiwi")))
    val adaptive = scoresOf(Engine.andAdaptive(reader, "fig", "kiwi", ratio = 8.0))
    assert(adaptive == idx && idx.keySet == Set(7L, 27L, 47L))
  }

  test("absent term short-circuits to empty") {
    assert(Engine.andAdaptive(reader, "fig", "zzz-not-here").isEmpty)
  }

  test("query-syntax AND takes the escape when the right term is hot") {
    import graft.query.QueryExec
    // df(the)=60 > 8 x df(fig)=6: "fig the" routes the right clause through
    // the scan verify; results must equal the plain set-algebra evaluation
    val viaQuery = scoresOf(QueryExec.run(reader, "fig the"))
    val direct = scoresOf(Engine.SetOps.and(
      Engine.matchScores(reader, "fig"), Engine.matchScores(reader, "the")))
    assert(viaQuery == direct && viaQuery.nonEmpty)
    // the escape is visible in the plan: no postings scan for "the"
    val plan = QueryExec.run(reader, "fig the").queryExecution.sparkPlan.toString
    assert(!plan.contains("term,the") && plan.contains("EqualTo(term,fig)"),
      s"hot term should not reach a postings scan:\n$plan")
    // reversed order stays on the index path (left bound is the hot term)
    val rev = scoresOf(QueryExec.run(reader, "the fig"))
    assert(rev == direct)
  }
}
