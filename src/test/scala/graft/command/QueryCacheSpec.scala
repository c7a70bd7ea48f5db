package graft.command

import graft.SparkTestBase
import graft.index.{Deletes, IndexBuilder, IndexConfig, IndexReader}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The select query-result cache: hit/miss accounting, result fidelity,
  * LocalRelation (job-free) hits, and natural invalidation via the reader's
  * cache epoch on tombstone appends.
  */
class QueryCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def freshReader(): IndexReader = {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana apple", "f", 10),
      (1L, "banana cherry", "f", 20),
      (2L, "apple cherry date", "g", 30),
      (3L, "date egg fig", "g", 40)
    ).toDF("docId", "content", "grp", "val")
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_").toString
    IndexBuilder.build(spark, docs, dir, IndexConfig(
      tokenizerName = "TokenDelimit", nShards = 2, buildPartitions = 2,
      hotTermDf = 100000L, nSalts = 2))
    new IndexReader(spark, dir)
  }

  private val P = SelectParams(query = Some("apple"),
    sortby = Seq("_id"), limit = 10, outputColumns = Seq("_id", "_score"))

  private def ids(r: SelectResult): Seq[Long] =
    r.hits.select("_id").collect().map(_.getLong(0)).toSeq

  test("second identical select is a cache hit with identical rows") {
    val reader = freshReader()
    QueryCache.clear()
    val r1 = Select.runCached(reader, P)
    assert(QueryCache.stats == ((0L, 1L)))
    val r2 = Select.runCached(reader, P)
    assert(QueryCache.stats == ((1L, 1L)))
    assert(ids(r1) == Seq(0L, 2L) && ids(r2) == ids(r1))
    assert(r2.nHits == r1.nHits)
    // a hit rebuilds from materialized rows: the plan must be a local
    // relation (no scan, no exchange — no job submission)
    val plan = r2.hits.queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), s"expected LocalRelation, got:\n$plan")
  }

  test("different parameters miss; capacity is LRU-bounded") {
    val reader = freshReader()
    QueryCache.clear()
    Select.runCached(reader, P)
    Select.runCached(reader, P.copy(query = Some("cherry")))
    assert(QueryCache.stats == ((0L, 2L)))
    Select.runCached(reader, P.copy(query = Some("cherry")))
    assert(QueryCache.stats == ((1L, 2L)))
  }

  test("tombstone append changes the epoch and invalidates naturally") {
    val reader = freshReader()
    QueryCache.clear()
    val before = ids(Select.runCached(reader, P))
    assert(before == Seq(0L, 2L))
    val e1 = reader.cacheEpoch
    Deletes.delete(reader, col("docId") === 0L)
    reader.invalidateDeletes()
    assert(reader.cacheEpoch != e1)
    val after = ids(Select.runCached(reader, P))
    assert(QueryCache.stats == ((0L, 2L)), "epoch change must be a miss")
    assert(after == Seq(2L))
  }

  test("two DIFFERENT UDF filters never share a cache entry") {
    val reader = freshReader()
    QueryCache.clear()
    // Column.toString renders both of these as "UDF(val)" — without the
    // function-identity fingerprint the second select would serve the
    // first one's rows (wrong results, silently)
    val gt = udf((v: Int) => v > 15)
    val lt = udf((v: Int) => v < 15)
    val base = SelectParams(sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id"))
    val r1 = ids(Select.runCached(reader, base.copy(filter = Some(gt(col("val"))))))
    val r2 = ids(Select.runCached(reader, base.copy(filter = Some(lt(col("val"))))))
    assert(r1 == Seq(1L, 2L, 3L) && r2 == Seq(0L), s"got $r1 / $r2")
    assert(QueryCache.stats == ((0L, 2L)), "distinct UDFs must both MISS")
    // ...while the SAME UDF object re-applied is still a hit
    val r3 = ids(Select.runCached(reader, base.copy(filter = Some(gt(col("val"))))))
    assert(r3 == r1 && QueryCache.stats == ((1L, 2L)))
  }

  test("non-deterministic filter bypasses the cache entirely") {
    val reader = freshReader()
    QueryCache.clear()
    val p = SelectParams(sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id"),
      filter = Some(rand(7L) >= lit(-1.0))) // always true, but NOT cacheable
    val r1 = ids(Select.runCached(reader, p))
    val r2 = ids(Select.runCached(reader, p))
    assert(r1 == Seq(0L, 1L, 2L, 3L) && r2 == r1)
    assert(QueryCache.stats == ((0L, 0L)), "rand() select must not be cached")
  }

  test("non-deterministic STRING parameters bypass the cache too") {
    val reader = freshReader()
    // sortby/scorer reach the plan as SQL strings (Select lowers them with
    // expr()) — a rand() there must bypass exactly like a rand() Column
    for (p <- Seq(
        SelectParams(sortby = Seq("rand()"), limit = 10, outputColumns = Seq("_id")),
        SelectParams(query = Some("apple"), scorer = Some("_score = rand()"),
          sortby = Seq("_id"), limit = 10, outputColumns = Seq("_id")),
        SelectParams(sortby = Seq("_id"), limit = 10,
          outputColumns = Seq("_id", "rand()")),
        // paren-less literal function: a bare current_date output column
        // resolves as CurrentDate() when no such doc column exists
        SelectParams(sortby = Seq("_id"), limit = 10,
          outputColumns = Seq("_id", "current_date")))) {
      QueryCache.clear()
      Select.runCached(reader, p)
      Select.runCached(reader, p)
      assert(QueryCache.stats == ((0L, 0L)),
        s"string-param non-determinism must not cache: $p")
    }
    // alias coverage: curdate() is current_date under another name
    QueryCache.clear()
    val pAlias = SelectParams(sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id"),
      filter = Some(expr("curdate() >= date'1970-01-01'")))
    Select.runCached(reader, pAlias)
    Select.runCached(reader, pAlias)
    assert(QueryCache.stats == ((0L, 0L)), "curdate() select must not be cached")
    // ...and a deterministic expression sortby still caches
    QueryCache.clear()
    val pDet = SelectParams(sortby = Seq("length(content)", "_id"), limit = 10,
      outputColumns = Seq("_id"))
    Select.runCached(reader, pDet)
    Select.runCached(reader, pDet)
    assert(QueryCache.stats == ((1L, 1L)))
  }

  test("bare current_time bypasses; a REAL doc column named `user` still caches") {
    val reader = freshReader()
    // current_time resolves as a paren-less literal function in Spark 4.1
    // (LiteralFunctionResolution) — wall-clock, never cacheable
    QueryCache.clear()
    val pTime = SelectParams(sortby = Seq("_id"), limit = 10,
      outputColumns = Seq("_id", "current_time"))
    Select.runCached(reader, pTime)
    Select.runCached(reader, pTime)
    assert(QueryCache.stats == ((0L, 0L)), "bare current_time must not cache")
    // ...but when the docs table HAS a column carrying a literal-function
    // name, column resolution wins in the analyzer: the select is fully
    // deterministic and must keep caching (a corpus with a `user` column
    // must not lose the cache on every select touching it)
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana", "alice"),
      (1L, "banana cherry", "bob")
    ).toDF("docId", "content", "user")
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_user_").toString
    IndexBuilder.build(spark, docs, dir, IndexConfig(
      tokenizerName = "TokenDelimit", nShards = 1, buildPartitions = 1,
      hotTermDf = 100000L, nSalts = 1))
    val uReader = new IndexReader(spark, dir)
    QueryCache.clear()
    val pUser = SelectParams(sortby = Seq("user"), limit = 10,
      outputColumns = Seq("_id", "user"),
      filter = Some(col("user") === "bob"))
    val r1 = Select.runCached(uReader, pUser)
    val r2 = Select.runCached(uReader, pUser)
    assert(QueryCache.stats == ((1L, 1L)),
      "a select over a real `user` column must cache")
    assert(ids(r2) == ids(r1) && ids(r1) == Seq(1L))
  }

  test("drilldowns are cached with the hits") {
    val reader = freshReader()
    QueryCache.clear()
    val p = P.copy(drilldowns = Seq(DrilldownSpec(keys = Seq("grp"))))
    val r1 = Select.runCached(reader, p)
    val r2 = Select.runCached(reader, p)
    assert(QueryCache.stats == ((1L, 1L)))
    val dd = r2.drilldowns("grp").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dd == r1.drilldowns("grp").collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    assert(dd == Set(("f", 1L), ("g", 1L)))
    assert(r2.drilldownTotals("grp") == 2L)
  }

  test("caseSensitive=true: an upper-case USER column does not shadow bare `user`") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana", "alice"),
      (1L, "banana cherry", "bob")
    ).toDF("docId", "content", "USER")
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_cs_").toString
    IndexBuilder.build(spark, docs, dir, IndexConfig(
      tokenizerName = "TokenDelimit", nShards = 1, buildPartitions = 1,
      hotTermDf = 100000L, nSalts = 1))
    val reader = new IndexReader(spark, dir)
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      // under case sensitivity a bare `user` does NOT resolve as the USER
      // column — the analyzer falls back to the session_user literal
      // function, a cross-session non-deterministic value: must bypass
      QueryCache.clear()
      val p = SelectParams(sortby = Seq("_id"), limit = 10,
        outputColumns = Seq("_id", "user"))
      Select.runCached(reader, p)
      Select.runCached(reader, p)
      assert(QueryCache.stats == ((0L, 0L)),
        "bare `user` is session_user under caseSensitive=true — must not cache")
      // the exact-case column reference still caches
      QueryCache.clear()
      val pExact = SelectParams(sortby = Seq("_id"), limit = 10,
        outputColumns = Seq("_id", "USER"))
      val r1 = Select.runCached(reader, pExact)
      val r2 = Select.runCached(reader, pExact)
      assert(QueryCache.stats == ((1L, 1L)))
      assert(ids(r2) == ids(r1))
    } finally spark.conf.set("spark.sql.caseSensitive", "false")
  }

  test("byte budget: eldest entries evict when the total exceeds maxBytes") {
    val reader = freshReader()
    val (mb, me) = (QueryCache.maxBytes, QueryCache.maxEntryBytes)
    try {
      QueryCache.clear()
      // measure one entry, then budget for ~2 of them
      Select.runCached(reader, P)
      val one = QueryCache.currentBytes
      assert(one > 0, "entry size accounting must be nonzero")
      QueryCache.maxBytes = one * 5 / 2
      QueryCache.clear()
      val pa = P; val pb = P.copy(query = Some("banana"))
      val pc = P.copy(query = Some("cherry"))
      Select.runCached(reader, pa) // miss
      Select.runCached(reader, pb) // miss
      Select.runCached(reader, pc) // miss → evicts pa (eldest)
      assert(QueryCache.currentBytes <= QueryCache.maxBytes,
        "byte budget exceeded after eviction")
      Select.runCached(reader, pc) // hit
      Select.runCached(reader, pa) // MISS again: was evicted
      assert(QueryCache.stats == ((1L, 4L)), QueryCache.stats.toString)
    } finally { QueryCache.maxBytes = mb; QueryCache.maxEntryBytes = me }
  }

  test("oversized page: refused from the cache but still served correctly") {
    val reader = freshReader()
    val (mb, me) = (QueryCache.maxBytes, QueryCache.maxEntryBytes)
    try {
      QueryCache.clear()
      QueryCache.maxEntryBytes = 1L // everything is oversized
      val r1 = Select.runCached(reader, P)
      val r2 = Select.runCached(reader, P)
      assert(ids(r1) == ids(r2) && ids(r1).nonEmpty)
      assert(QueryCache.stats == ((0L, 2L)), "oversized pages must never hit")
      assert(QueryCache.oversizedCount == 2L)
      assert(QueryCache.currentBytes == 0L, "refused pages must not pin bytes")
    } finally { QueryCache.maxBytes = mb; QueryCache.maxEntryBytes = me }
  }

  test("metricsDF: one-row snapshot of counts and budget occupancy") {
    val reader = freshReader()
    QueryCache.clear()
    Select.runCached(reader, P)
    Select.runCached(reader, P)
    val m = QueryCache.metricsDF(spark).collect().head
    assert(m.schema.fieldNames.toSeq == Seq("hits", "misses", "oversized",
      "entries", "bytes", "max_bytes", "max_entry_bytes"))
    assert(m.getLong(0) == 1L && m.getLong(1) == 1L && m.getLong(3) == 1L)
    assert(m.getLong(4) > 0L && m.getLong(4) == QueryCache.currentBytes)
  }

  test("filterScript: deterministic text caches; rand()/now() bypass") {
    val reader = freshReader()
    QueryCache.clear()
    val p = SelectParams(filterScript = Some("val >= 30"),
      sortby = Seq("_id"), limit = 10, outputColumns = Seq("_id"))
    val r1 = Select.runCached(reader, p)
    val r2 = Select.runCached(reader, p)
    assert(QueryCache.stats == ((1L, 1L)))
    assert(ids(r1) == ids(r2) && ids(r1) == Seq(2L, 3L))
    QueryCache.clear()
    val pr = p.copy(filterScript = Some("val >= rand(100)"))
    Select.runCached(reader, pr)
    Select.runCached(reader, pr)
    assert(QueryCache.stats._1 == 0L, "rand() in a script filter must bypass")
    val pn = p.copy(filterScript = Some("val <= now()"))
    Select.runCached(reader, pn)
    assert(QueryCache.stats._1 == 0L, "now() in a script filter must bypass")
  }
}
