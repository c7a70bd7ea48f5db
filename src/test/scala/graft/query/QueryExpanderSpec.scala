package graft.query

import graft.SparkTestBase
import graft.command.{QueryCache, Select, SelectParams}
import graft.index.{IndexBuilder, IndexConfig, IndexReader}
import org.scalatest.funsuite.AnyFunSuite

/** Library-side `--query_expander` (reference grn_expr_syntax_expand_query,
  * lib/expr.c:7804-7917): the term scanner, the TSV and TABLE.COLUMN
  * dictionary forms, and the Select wiring — including that the query
  * cache keys on the EXPANDED string. The 40 reference query_expander
  * fixtures in the compat sweep gate the same scanner (GrnTestRunner
  * delegates here).
  */
class QueryExpanderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val syn = Map("rabbit" -> "((rabbit) OR (bunny))", "fast ship" -> "quick")

  test("terms expand; operators, OR, col:op prefixes and misses copy through") {
    def x(q: String) = QueryExpander.expandTerms(q, syn, identity)
    assert(x("rabbit") == "((rabbit) OR (bunny))")
    assert(x("dog rabbit") == "dog ((rabbit) OR (bunny))")
    assert(x("+rabbit -dog") == "+((rabbit) OR (bunny)) -dog")
    assert(x("rabbit OR dog") == "((rabbit) OR (bunny)) OR dog")
    assert(x("(rabbit)") == "(((rabbit) OR (bunny)))")
    // quoted phrase expands as ONE term; a miss keeps the original span
    assert(x("\"fast ship\"") == "quick")
    assert(x("\"slow ship\"") == "\"slow ship\"")
    // col:op prefix copies verbatim, the value restarts as a fresh term
    assert(x("title:@rabbit") == "title:@((rabbit) OR (bunny))")
    assert(x("n:>=10") == "n:>=10")
    // not recursive: the expansion text is NOT re-expanded
    val loop = Map("a" -> "a b", "b" -> "BOOM")
    assert(QueryExpander.expandTerms("a", loop, identity) == "a b")
  }

  test("ALLOW_COLUMN off: `col:term` is ONE literal term for expansion") {
    // the reference scanner gates the col:op prefix on GRN_EXPR_ALLOW_COLUMN
    // (grn_expr_syntax_expand_query_terms), so with --query_flags clearing
    // it, `syn:foo` expands as a single term, not a prefix + value
    val dict = Map("syn:foo" -> "((a) OR (b))", "foo" -> "baz")
    assert(QueryExpander.expandTerms("syn:foo", dict, identity) == "syn:baz")
    assert(QueryExpander.expandTerms("syn:foo", dict, identity,
      allowColumn = false) == "((a) OR (b))")
    // threaded from the select's query flags
    val e = QueryExpander(dict)
    assert(e.expand("syn:foo",
      QueryParser.QueryFlags(allowColumn = false)) == "((a) OR (b))")
    assert(e.expand("syn:foo", QueryParser.QueryFlags.default) == "syn:baz")
  }

  test("empty dictionary ⇒ the scanner is the identity (randomized)") {
    // with no synonyms every path copies the input through verbatim:
    // ops, quotes (closed or not), col:op prefixes, OR, whitespace, terms
    val rnd = new scala.util.Random(42)
    val pool = "abcXY01 \t+-()*<>~\":@^$!=OR日本".toCharArray
    (0 until 3000).foreach { _ =>
      val q = new String(Array.fill(rnd.nextInt(30))(pool(rnd.nextInt(pool.length))))
      assert(QueryExpander.expandTerms(q, Map.empty, identity) == q,
        s"not identity on: ${q.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("TSV dictionary: words OR-join, comments and blanks skip") {
    val m = QueryExpander.parseTsv(
      "# comment\nrabbit\tbunny\thare\n\nsolo\tonly\n")
    assert(m == Map("rabbit" -> "((bunny) OR (hare))", "solo" -> "only"))
  }

  test("fromTable: scalar and vector synonym columns, normalized keys") {
    import spark.implicits._
    val scalar = Seq(("Rabbit", "bunny")).toDF("key", "syn")
    val eS = QueryExpander.fromTable(scalar, "key", "syn", _.toLowerCase)
    assert(eS.expand("RABBIT") == "bunny") // table normalizer applies to lookups
    val vector = Seq(("rabbit", Seq("rabbit", "bunny"))).toDF("key", "syn")
    val eV = QueryExpander.fromTable(vector, "key", "syn")
    assert(eV.expand("rabbit dog") == "((rabbit) OR (bunny)) dog")
  }

  test("Select with an expander ≡ the hand-expanded query; cache keys on expansion") {
    import spark.implicits._
    val docs = Seq(
      (0L, "rabbit eats"), (1L, "bunny sleeps"), (2L, "dog barks")
    ).toDF("docId", "content")
    val dir = java.nio.file.Files.createTempDirectory("graft_qe_").toString
    IndexBuilder.build(spark, docs, dir, IndexConfig(
      tokenizerName = "TokenDelimit", nShards = 1, buildPartitions = 1,
      hotTermDf = 100000L, nSalts = 1))
    val reader = new IndexReader(spark, dir)
    val synDf = Seq(("rabbit", Seq("rabbit", "bunny"))).toDF("key", "syn")
    val expander = QueryExpander.fromTable(synDf, "key", "syn")
    def ids(p: SelectParams) =
      Select.run(reader, p).hits.select("_id").collect().map(_.getLong(0)).toSeq
    val base = SelectParams(sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id", "_score"))
    val expanded = ids(base.copy(query = Some("rabbit"),
      queryExpander = Some(expander)))
    assert(expanded == Seq(0L, 1L))
    assert(expanded == ids(base.copy(query = Some("((rabbit) OR (bunny))"))))
    // cache: an expander-carrying select keys on the EXPANDED string, so it
    // shares the entry with the equivalent literal query (and two expander
    // INSTANCES with equal dictionaries share too)
    QueryCache.clear()
    Select.runCached(reader, base.copy(query = Some("((rabbit) OR (bunny))")))
    Select.runCached(reader, base.copy(query = Some("rabbit"),
      queryExpander = Some(QueryExpander.fromTable(synDf, "key", "syn"))))
    assert(QueryCache.stats == ((1L, 1L)),
      "expanded query must HIT the literal query's cache entry")
  }
}
