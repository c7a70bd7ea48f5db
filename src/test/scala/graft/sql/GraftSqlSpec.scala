package graft.sql

import graft.SparkTestBase
import graft.index.{IndexBuilder, IndexConfig, IndexReader}
import graft.query.QueryExec
import org.scalatest.funsuite.AnyFunSuite

/** The Spark SQL surface: `graft_match(docId, dir, query)` rewrites to an
  * index-backed LEFT SEMI join (both installation routes), the marker never
  * survives optimization, other WHERE conjuncts stay, the lookup side keeps
  * its term-pruned parquet pushdown, and unsupported positions fail with an
  * actionable message.
  */
class GraftSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val (dir, reader) = {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana apple", "en"),
      (1L, "banana cherry", "en"),
      (2L, "apple cherry date", "de"),
      (3L, "date egg fig", "en")
    ).toDF("docId", "content", "lang")
    val d = java.nio.file.Files.createTempDirectory("graft_sql_").toString
    IndexBuilder.build(spark, docs, d, IndexConfig(
      tokenizerName = "TokenDelimit", nShards = 2, buildPartitions = 2,
      hotTermDf = 100000L, nSalts = 2))
    (d, new IndexReader(spark, d))
  }

  private def installAndView(): Unit = {
    GraftSql.install(spark)
    reader.docs.createOrReplaceTempView("docs_v")
  }

  test("graft_match filters via the index; result ≡ the API path") {
    installAndView()
    val got = spark.sql(
      s"SELECT docId FROM docs_v WHERE graft_match(docId, '$dir', 'apple OR fig') ORDER BY docId")
    val want = QueryExec.run(reader, "apple OR fig")
      .toDF("docId", "s").select("docId").collect().map(_.getLong(0)).sorted
    assert(got.collect().map(_.getLong(0)).toSeq == want.toSeq)
    assert(want.nonEmpty)
  }

  test("the marker is eliminated; the plan is a LEFT SEMI join with pruned lookup") {
    installAndView()
    val df = spark.sql(
      s"SELECT docId FROM docs_v WHERE graft_match(docId, '$dir', 'apple')")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("graft_match"), s"marker survived:\n$opt")
    assert(opt.contains("LeftSemi"), s"expected semi join:\n$opt")
    // the lookup subtree keeps the API path's term-pruned scan: the term
    // predicate reaches the segments parquet as a pushed filter
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") && phys.contains("apple"),
      s"expected term-pruned segments scan:\n$phys")
  }

  test("other WHERE conjuncts survive the rewrite") {
    installAndView()
    val got = spark.sql(
      s"""SELECT docId FROM docs_v
         |WHERE graft_match(docId, '$dir', 'apple') AND lang = 'en'
         |ORDER BY docId""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L)) // doc 2 matches 'apple' but is lang=de
  }

  test("OR of graft_match markers rewrites to a unioned semi-join") {
    installAndView()
    // fig: doc 3; cherry: docs 1,2 — membership is the union
    val got = spark.sql(
      s"""SELECT docId FROM docs_v
         |WHERE graft_match(docId, '$dir', 'fig')
         |   OR graft_match(docId, '$dir', 'cherry')
         |ORDER BY docId""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L))
    // the OR group composes with further AND conjuncts
    val got2 = spark.sql(
      s"""SELECT docId FROM docs_v
         |WHERE (graft_match(docId, '$dir', 'fig')
         |    OR graft_match(docId, '$dir', 'apple')) AND lang = 'en'
         |ORDER BY docId""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(0L, 3L)) // apple: 0,2(de); fig: 3
  }

  test("NOT graft_match rewrites to an anti join") {
    installAndView()
    val got = spark.sql(
      s"""SELECT docId FROM docs_v
         |WHERE NOT graft_match(docId, '$dir', 'banana')
         |ORDER BY docId""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L)) // banana in docs 0,1
    // apple AND NOT banana — the reference AND_NOT set op
    val got2 = spark.sql(
      s"""SELECT docId FROM docs_v
         |WHERE graft_match(docId, '$dir', 'apple')
         |  AND NOT graft_match(docId, '$dir', 'banana')""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(2L))
  }

  test("a marker under OR fails with an actionable message") {
    installAndView()
    val e = intercept[Throwable] {
      spark.sql(
        s"SELECT docId FROM docs_v WHERE graft_match(docId, '$dir', 'apple') OR lang = 'de'")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("top-level AND conjunct")),
      s"unexpected error: $e")
  }

  test("install registers the scalar/geo UDF families for SQL use") {
    GraftSql.install(spark)
    assert(spark.sql("SELECT edit_distance('kitten', 'sitting')")
      .collect().head.getInt(0) == 3)
    assert(spark.sql("SELECT html_untag('<b>x</b>')")
      .collect().head.getString(0) == "x")
    // explicit-keyword snippet/highlight for ad-hoc SQL
    val hl = spark.sql(
      "SELECT highlight_html('an apple a day', 'apple,day')")
      .collect().head.getString(0)
    assert(hl == "an <span class=\"keyword\">apple</span> a " +
      "<span class=\"keyword\">day</span>", hl)
    val sn = spark.sql(
      "SELECT snippet_html('an apple a day', 'apple')")
      .collect().head.getSeq[String](0)
    assert(sn.nonEmpty && sn.head.contains("<span class=\"keyword\">apple</span>"))
    assert(spark.sql("SELECT snippet_html('no match here', 'zebra')")
      .collect().head.isNullAt(0))
    // pipeline cleaning scalars
    assert(spark.sql("SELECT graft_redact_pii('mail a.b@c.io or 10.0.0.1')")
      .collect().head.getString(0) == "mail <PII> or <PII>")
    assert(spark.sql("SELECT graft_pii_count('a.b@c.io and 555-123-4567')")
      .collect().head.getLong(0) == 2L)
    // tokenize command parity: the analysis chain's token texts
    assert(spark.sql("SELECT grn_tokenize('Fast Keys', 'TokenDelimit', 'ADD')")
      .collect().head.getSeq[String](0) == Seq("fast", "keys"))
    assert(spark.sql("SELECT grn_tokenize('ab', 'TokenBigram', 'ADD')")
      .collect().head.getSeq[String](0).nonEmpty)
  }

  test("graft_search / graft_bm25 table functions return scored rows") {
    installAndView()
    // graft_search: every match, reference default scorer — same rows and
    // scores as the API path
    val got = spark.sql(
      s"SELECT docId, score FROM graft_search('$dir', 'apple OR fig') ORDER BY docId")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = QueryExec.run(reader, "apple OR fig")
      .toDF("docId", "score").orderBy("docId")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty)
    // graft_bm25: WAND top-k, joinable back to the docs table
    val topDf = spark.sql(
      s"""SELECT d.docId, d.lang, s.score
         |FROM graft_bm25('$dir', 'apple', 2) s
         |JOIN docs_v d ON d.docId = s.docId
         |ORDER BY s.score DESC, d.docId""".stripMargin)
    val top = topDf.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val wantTop = graft.search.Engine.bm25TopK(reader, "apple", 2)
      .collect().sortBy(sd => (-sd.score, sd.docId)).map(_.docId).toSeq
    assert(top.map(_._1) == wantTop && top.size == 2)
    // any foldable INTEGRAL literal is accepted as k — incl. TINYINT
    val tiny = spark.sql(
      s"SELECT docId FROM graft_bm25('$dir', 'apple', CAST(2 AS TINYINT))")
      .collect().map(_.getLong(0)).toSet
    assert(tiny == top.map(_._1).toSet)
  }

  test("graft_logical_count / graft_logical_range SQL over a sharded table") {
    installAndView()
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val rows = Seq(
      (1L, ts("2024-01-01T10:00:00Z")), (2L, ts("2024-01-02T10:00:00Z")),
      (3L, ts("2024-01-02T11:00:00Z")), (4L, ts("2024-01-03T10:00:00Z"))
    ).toDF("id", "t")
    val root = java.nio.file.Files
      .createTempDirectory("graft_sql_log_").toString + "/t"
    graft.command.Logical.writeSharded(rows, "t", root)
    // [min, max) over the SQL surface = the library count
    val n = spark.sql(
      s"SELECT n FROM graft_logical_count('$root', 't', '2024-01-02T00:00:00Z', '2024-01-03T00:00:00Z')")
      .head().getLong(0)
    assert(n == 2L)
    // open ends via empty strings
    assert(spark.sql(
      s"SELECT n FROM graft_logical_count('$root', 't', '', '')")
      .head().getLong(0) == 4L)
    val ids = spark.sql(
      s"""SELECT id FROM graft_logical_range('$root', 't',
         |'2024-01-02T00:00:00Z', '', 2)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L, 3L))
    // the SQL plan keeps the shard pruning
    val p = spark.sql(
      s"SELECT id FROM graft_logical_range('$root', 't', '2024-01-02T00:00:00Z', '', 2)")
      .queryExecution.sparkPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("_shard"),
      s"SQL logical range lost partition pruning:\n$p")
    // 6th arg: tiebreak columns pin the page boundary on tied shard keys
    val tied = spark.sql(
      s"""SELECT id FROM graft_logical_range('$root', 't',
         |'2024-01-01T00:00:00Z', '', 3, 'id')""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(tied == Seq(1L, 2L, 3L))
  }

  test("a rebuilt index (new manifest) invalidates the rule's reader cache") {
    import spark.implicits._
    GraftSql.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft_sql_rb_").toString
    def build(extra: Boolean): Unit = {
      val rows = Seq((0L, "kiwi melon"), (1L, "melon plum")) ++
        (if (extra) Seq((2L, "kiwi plum")) else Nil)
      IndexBuilder.build(spark, rows.toDF("docId", "content"), d, IndexConfig(
        tokenizerName = "TokenDelimit", nShards = 1, buildPartitions = 1,
        hotTermDf = 100000L, nSalts = 1))
      new IndexReader(spark, d).docs.createOrReplaceTempView("docs_rb")
    }
    def ids() = spark.sql(
      s"SELECT docId FROM docs_rb WHERE graft_match(docId, '$d', 'kiwi') ORDER BY docId")
      .collect().map(_.getLong(0)).toSeq
    build(extra = false)
    assert(ids() == Seq(0L))
    // compaction/rebuild semantics: wipe and rebuild with one more doc —
    // the SQL path must see the new manifest, not the cached reader
    def rmRf(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmRf)
      java.nio.file.Files.delete(p)
    }
    rmRf(java.nio.file.Paths.get(d))
    build(extra = true)
    assert(ids() == Seq(0L, 2L), "stale reader served a rebuilt index")
  }

  test("tombstone appends invalidate the SQL reader cache; bad dirs error clearly") {
    import spark.implicits._
    GraftSql.install(spark)
    val d = java.nio.file.Files.createTempDirectory("graft_sql_del_").toString
    IndexBuilder.build(spark,
      Seq((0L, "pear fig"), (1L, "pear plum")).toDF("docId", "content"),
      d, IndexConfig(tokenizerName = "TokenDelimit", nShards = 1,
        buildPartitions = 1, hotTermDf = 100000L, nSalts = 1))
    val r = new IndexReader(spark, d)
    r.docs.createOrReplaceTempView("docs_del")
    def ids() = spark.sql(
      s"SELECT docId FROM docs_del WHERE graft_match(docId, '$d', 'pear') ORDER BY docId")
      .collect().map(_.getLong(0)).toSeq
    assert(ids() == Seq(0L, 1L)) // populates the reader cache
    // a tombstone append never rewrites manifest.json — the fingerprint
    // must still change, or the cached reader's memoized deleted-id set
    // keeps serving the deleted doc
    graft.index.Deletes.delete(r, org.apache.spark.sql.functions.col("docId") === 1L)
    assert(ids() == Seq(0L), "SQL path served a tombstoned doc from a stale reader")
    // a wrong index dir names the problem, not a raw NoSuchFileException
    val e = intercept[Throwable] {
      spark.sql(s"SELECT * FROM graft_search('$d-nope', 'pear')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("no index at")), s"unexpected error: $e")
  }

  test("graft_cache_limit sets the budget and replies with the previous") {
    installAndView()
    val before = graft.command.QueryCache.maxBytes
    try {
      val r0 = spark.sql("SELECT * FROM graft_cache_limit()").head()
      assert(r0.getLong(0) == before && r0.getLong(1) == before)
      val r1 = spark.sql("SELECT * FROM graft_cache_limit(1048576)").head()
      assert(r1.getLong(0) == before && r1.getLong(1) == 1048576L)
      assert(graft.command.QueryCache.maxBytes == 1048576L)
      // non-positive budgets are rejected, budget unchanged
      intercept[Throwable] {
        spark.sql("SELECT * FROM graft_cache_limit(0)").collect()
      }
      assert(graft.command.QueryCache.maxBytes == 1048576L)
    } finally graft.command.QueryCache.setMaxBytes(before): Unit
  }

  test("graft_metrics reports the query cache and live serving instances") {
    installAndView()
    val serving = new graft.search.LocalServing(reader)
    val rows = spark.sql("SELECT * FROM graft_metrics()").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.contains("query_cache"))
    val qc = rows("query_cache")
    assert(qc.getLong(7) == graft.command.QueryCache.maxBytes)
    val sKey = s"serving:$dir"
    assert(rows.contains(sKey), s"serving row missing: ${rows.keys}")
    // exercise the serving path; the counters must move in the next snapshot
    serving.bm25TopK("banana", 1): Unit
    val after = spark.sql(
      s"SELECT hits + misses FROM graft_metrics() WHERE component = '$sKey'")
      .head().getLong(0)
    assert(after >= 1L, s"serving counters did not move: $after")
  }

  test("config-route extensions session rewrites too (injectOptimizerRule)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val s2 = org.apache.spark.sql.GraftTestSessionBridge
      .newSessionWithExtensions(spark.sparkContext, ext)
    new IndexReader(s2, dir).docs.createOrReplaceTempView("docs_v2")
    val got = s2.sql(
      s"SELECT docId FROM docs_v2 WHERE graft_match(docId, '$dir', 'banana') ORDER BY docId")
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(!got.queryExecution.optimizedPlan.toString.toLowerCase.contains("graft_match"))
    // the config route injects the scored TVFs too
    val tvf = s2.sql(s"SELECT docId FROM graft_bm25('$dir', 'banana', 1)")
      .collect().map(_.getLong(0)).toSeq
    assert(tvf.length == 1 && Seq(0L, 1L).contains(tvf.head))
  }
}
