package graft.sql

import graft.index.IndexReader
import graft.query.QueryExec
import graft.search.Engine
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Expression, ExpressionInfo, Not, PredicateHelper, Unevaluable}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}

/** Spark SQL surface for the full-text index: a `graft_match(docId, dir,
  * query)` predicate that Catalyst REWRITES into an index-backed semi-join
  * — the `SparkSessionExtensions` route the survey reserves for operators
  * the built-in ones can't express (SURVEY §4.1 "an optional SparkStrategy
  * can expose it to SQL later"; reference entry point: the select command's
  * `--query`, proc_select.c).
  *
  * ```sql
  * SELECT * FROM docs WHERE graft_match(docId, '/indexes/docs', 'spark OR dup')
  * ```
  *
  * plans as `docs LEFT SEMI JOIN <index lookup>` — the lookup subtree is the
  * SAME term-pruned postings plan the API path produces (term-`isin`
  * pushdown into the segments parquet, salting, skip-decode), so SQL users
  * get index economics without touching the library API. The marker itself
  * is [[Unevaluable]]: it never executes, it only marks the predicate for
  * [[IndexMatchRewrite]].
  *
  * SCORED search comes as table-valued functions (a WHERE predicate cannot
  * add columns):
  *
  * ```sql
  * SELECT d.*, s.score
  * FROM graft_bm25('/indexes/docs', 'spark dup', 10) s
  * JOIN docs d ON d.docId = s.docId
  * ORDER BY s.score DESC
  * ```
  *
  * `graft_search(dir, query)` yields every match with the reference default
  * scorer (the select `--query` semantics); `graft_bm25(dir, query, k)`
  * yields the block-max-WAND top-k. Both return (docId BIGINT, score
  * DOUBLE) and plan as the API path's term-pruned scans.
  *
  * Two installation routes:
  *  - cluster config: `--conf spark.sql.extensions=graft.sql.GraftExtensions`
  *  - live session: `GraftSql.install(spark)` (function registry +
  *    `spark.experimental.extraOptimizations`)
  */
object GraftSql {

  /** Per-session reader cache keyed by index dir, invalidated when the
    * on-disk index state changes: manifest.json mtime+size (rebuilds and
    * compactions rewrite it) PLUS the deletes directory's file-count:bytes
    * tag — tombstone appends never touch the manifest, and a cached
    * reader memoizes its deleted-id set, so the fingerprint must cover
    * them (mirrors `IndexReader.cacheEpoch`). A few stat calls per query:
    * cheap against a whole planning pass.
    *
    * Readers hold their SparkSession strongly, so plain weak keying would
    * never collect (value → key). Values are SoftReferences: a retired
    * session's readers — and through them the session — become softly
    * reachable and are reclaimed under memory pressure, bounding the
    * growth of a session-per-job driver; a collected entry just rebuilds.
    */
  private val readersBySession =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        String, (String, java.lang.ref.SoftReference[IndexReader])]]()

  private def indexFingerprint(spark: SparkSession, dir: String): String = {
    val mf = graft.core.Fs.mtimeAndSize(spark, s"$dir/manifest.json")
      .getOrElse(throw new IllegalArgumentException(
        s"graft: no index at $dir (missing manifest.json)"))
    val (n, bytes) = graft.core.Fs.dirStats(spark, s"$dir/deletes")
    s"${mf._1}:${mf._2}:$n:$bytes"
  }

  def readerFor(spark: SparkSession, dir: String): IndexReader = {
    val readers = readersBySession.synchronized {
      var m = readersBySession.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[
          String, (String, java.lang.ref.SoftReference[IndexReader])]()
        readersBySession.put(spark, m)
      }
      m
    }
    val fp = indexFingerprint(spark, dir)
    // hold the reader in a local strong ref through the compute so a GC
    // between insert and return can never hand back a cleared reference
    var result: IndexReader = null
    readers.compute(dir, (d, cur) => {
      val cached = if (cur != null && cur._1 == fp) cur._2.get() else null
      result = if (cached != null) cached else new IndexReader(spark, d)
      if (cached != null) cur
      else (fp, new java.lang.ref.SoftReference(result))
    })
    result
  }

  private[sql] def litString(e: Expression, fn: String, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: $what must be a string literal, got $e")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be null")
    v.toString
  }

  private def litInt(e: Expression, fn: String, what: String): Int = {
    require(e.foldable, s"$fn: $what must be an integer literal, got $e")
    e.eval() match {
      case i: Int => i
      case l: Long => java.lang.Math.toIntExact(l) // error, never silent wrap
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
  }

  /** Marker predicate: `graft_match(docId, '<indexDir>', '<query>')`.
    * Boolean, never evaluated — [[IndexMatchRewrite]] must eliminate it; an
    * occurrence outside a WHERE/HAVING conjunction fails at planning with
    * Spark's unevaluable-expression error, which is the correct contract
    * (same pattern as Spark's own `grouping()` marker).
    */
  case class GraftMatch(docId: Expression, dir: Expression, query: Expression)
      extends Expression with Unevaluable {
    override def children: Seq[Expression] = Seq(docId, dir, query)
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_match"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(docId = newChildren(0), dir = newChildren(1), query = newChildren(2))
  }

  /** Function-registry entry shared by both installation routes. */
  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_match"),
    new ExpressionInfo(GraftMatch.getClass.getCanonicalName, "graft_match"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        s"graft_match(docId, indexDir, query) takes 3 arguments, got ${args.length}")
      GraftMatch(args(0), args(1), args(2))
    })

  /** `graft_search(indexDir, query)` — every match with the reference
    * default scorer, as a table of (docId, score). The builder resolves on
    * the thread's active session (TVF builders receive no session); it runs
    * at analysis and only PLANS — the jobs run when the enclosing query
    * does.
    */
  val searchTvfDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_search"),
    new ExpressionInfo(GraftSql.getClass.getCanonicalName, "graft_search"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"graft_search(indexDir, query) takes 2 arguments, got ${args.length}")
      val spark = SparkSession.active
      val reader = readerFor(spark, litString(args(0), "graft_search", "indexDir"))
      QueryExec.run(reader, litString(args(1), "graft_search", "query"))
        .toDF("docId", "score")
        .queryExecution.analyzed
    })

  /** `graft_bm25(indexDir, query, k)` — block-max-WAND BM25 top-k as a
    * table of (docId, score), the flagship serving query in SQL form.
    */
  val bm25TvfDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_bm25"),
    new ExpressionInfo(GraftSql.getClass.getCanonicalName, "graft_bm25"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        s"graft_bm25(indexDir, query, k) takes 3 arguments, got ${args.length}")
      val spark = SparkSession.active
      val reader = readerFor(spark, litString(args(0), "graft_bm25", "indexDir"))
      Engine.bm25TopK(reader,
          litString(args(1), "graft_bm25", "query"),
          litInt(args(2), "graft_bm25", "k"))
        .toDF("docId", "score")
        .queryExecution.analyzed
    })

  private def litTsOpt(e: Expression, fn: String, what: String): Option[java.sql.Timestamp] = {
    val s = litString(e, fn, what)
    if (s.isEmpty) None
    else Some(java.sql.Timestamp.from(java.time.Instant.parse(s)))
  }

  /** `graft_logical_count(root, shardKey, minIso, maxIso)` — the sharded
    * logical_count as a one-row SQL table function; empty-string bounds
    * are open ends. Bounds are ISO instants (`2024-01-10T00:00:00Z`),
    * min inclusive / max exclusive (the common window convention; the
    * library API exposes the full border set).
    */
  val logicalCountTvfDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_logical_count"),
    new ExpressionInfo(GraftSql.getClass.getCanonicalName, "graft_logical_count"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        s"graft_logical_count(root, shardKey, minIso, maxIso) takes 4 arguments, got ${args.length}")
      val spark = SparkSession.active
      graft.command.Logical.countDF(spark,
          litString(args(0), "graft_logical_count", "root"),
          litString(args(1), "graft_logical_count", "shardKey"),
          graft.command.Logical.LogicalRange(
            min = litTsOpt(args(2), "graft_logical_count", "minIso"),
            max = litTsOpt(args(3), "graft_logical_count", "maxIso"),
            maxInclude = false))
        .queryExecution.analyzed
    })

  /** `graft_logical_range(root, shardKey, minIso, maxIso, limit
    * [, tiebreak])` — the sharded logical_range_filter page (shard-key
    * ascending) as a SQL table function; plans partition-pruned
    * TakeOrdered like the API path. The optional 6th argument is a
    * comma-separated tiebreak column list — without one, rows tied on the
    * shard key sit at an unstable page boundary (the reference ties on
    * `_id`; pass your row-id column).
    */
  val logicalRangeTvfDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_logical_range"),
    new ExpressionInfo(GraftSql.getClass.getCanonicalName, "graft_logical_range"),
    (args: Seq[Expression]) => {
      require(args.length == 5 || args.length == 6,
        s"graft_logical_range(root, shardKey, minIso, maxIso, limit[, tiebreak]) takes 5-6 arguments, got ${args.length}")
      val spark = SparkSession.active
      val tiebreak = args.lift(5)
        .map(litString(_, "graft_logical_range", "tiebreak"))
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil)
      graft.command.Logical.rangeFilter(spark,
          litString(args(0), "graft_logical_range", "root"),
          litString(args(1), "graft_logical_range", "shardKey"),
          graft.command.Logical.LogicalRange(
            min = litTsOpt(args(2), "graft_logical_range", "minIso"),
            max = litTsOpt(args(3), "graft_logical_range", "maxIso"),
            maxInclude = false),
          limit = litInt(args(4), "graft_logical_range", "limit"),
          tiebreak = tiebreak)
        .queryExecution.analyzed
    })

  private def litLong(e: Expression, fn: String, what: String): Long = {
    require(e.foldable, s"$fn: $what must be an integer literal, got $e")
    e.eval() match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
  }

  /** `graft_cache_limit([bytes])` — the reference `cache_limit` command
    * (lib/proc.c registration over grn_cache): with an argument, sets the
    * query-result cache's byte budget (evicting immediately to fit);
    * always returns one row (prev_max_bytes, max_bytes) — the reference
    * replies with the previous limit the same way.
    */
  val cacheLimitTvfDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_cache_limit"),
    new ExpressionInfo(GraftSql.getClass.getCanonicalName, "graft_cache_limit"),
    (args: Seq[Expression]) => {
      require(args.length <= 1,
        s"graft_cache_limit([bytes]) takes 0-1 arguments, got ${args.length}")
      val spark = SparkSession.active
      import spark.implicits._
      val prev = args.headOption match {
        case Some(a) => graft.command.QueryCache.setMaxBytes(
          litLong(a, "graft_cache_limit", "bytes"))
        case None => graft.command.QueryCache.maxBytes
      }
      Seq((prev, graft.command.QueryCache.maxBytes))
        .toDF("prev_max_bytes", "max_bytes")
        .queryExecution.analyzed
    })

  /** `graft_metrics()` — ops snapshot of the serving surfaces as one SQL
    * table (the reference's `status` command role): a `query_cache` row
    * ([[graft.command.QueryCache.metricsDF]]) plus one `serving:<dir>` row
    * per live [[graft.search.LocalServing]] instance. Unified columns;
    * -1 marks a metric a component does not track.
    */
  val metricsTvfDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_metrics"),
    new ExpressionInfo(GraftSql.getClass.getCanonicalName, "graft_metrics"),
    (args: Seq[Expression]) => {
      require(args.isEmpty, s"graft_metrics() takes no arguments, got ${args.length}")
      val spark = SparkSession.active
      import spark.implicits._
      val qc = {
        val r = graft.command.QueryCache.metricsDF(spark).head()
        ("query_cache", r.getLong(0), r.getLong(1), -1L, r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))
      }
      val serving = graft.search.LocalServing.liveInstances.map {
        case (dir, s) =>
          (s"serving:$dir", s.hits, s.misses, s.fallbacks,
            s.oversizedTerms.toLong, -1L, s.cachedBytesNow, -1L)
      }
      (qc +: serving)
        .toDF("component", "hits", "misses", "fallbacks", "oversized",
          "entries", "bytes", "max_bytes")
        .queryExecution.analyzed
    })

  /** Install on a LIVE session: registers `graft_match` + the scored TVFs
    * + the Groonga scalar/geo UDF families (`edit_distance`, `html_untag`,
    * `string_length`, `fuzzy_search`, `prefix_rk_search`, `geo_distance`,
    * `geo_in_circle`, ...) and appends the rewrite rule to
    * `spark.experimental.extraOptimizations`. Idempotent. (The config
    * route — `spark.sql.extensions=graft.sql.GraftExtensions` — is
    * preferred on a cluster: extension rules run inside the
    * operator-optimization batch; experimental rules run in their own
    * later batch. Both see an already-optimized lookup subtree, see
    * [[IndexMatchRewrite]]. The UDF families need a live session, so on
    * the config route call `GrnScalars.register`/`GrnGeo.register` after
    * session build.)
    */
  def install(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (ident, info, builder) = functionDescription
    cs.sessionState.functionRegistry.registerFunction(ident, info, builder)
    for ((i, nfo, b) <- Seq(searchTvfDescription, bm25TvfDescription,
      logicalCountTvfDescription, logicalRangeTvfDescription,
      cacheLimitTvfDescription, metricsTvfDescription))
      cs.sessionState.tableFunctionRegistry.registerFunction(i, nfo, b)
    graft.functions.GrnScalars.register(spark)
    graft.functions.GrnGeo.register(spark)
    // pipeline cleaning scalars for plain SQL use (batch callers should
    // prefer the codegen column forms in graft.ops.TextAnalysis)
    spark.udf.register("graft_redact_pii",
      (s: String) => graft.ops.TextAnalysis.redactPiiString(s))
    spark.udf.register("graft_pii_count",
      (s: String) => graft.ops.TextAnalysis.piiCountString(s))
    if (!cs.experimental.extraOptimizations.exists(_.isInstanceOf[IndexMatchRewrite]))
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ IndexMatchRewrite(spark)
  }
}

/** Rewrites `Filter(... AND graft_match(docId, dir, query) AND ...)` into
  * `Filter(rest, child LEFT-SEMI-JOIN indexLookup(dir, query) ON docId)`.
  *
  * Supported marker positions beyond the plain conjunct:
  *   - `NOT graft_match(...)` as a conjunct → LEFT ANTI join (the
  *     reference's AND_NOT set op);
  *   - `graft_match(..) OR graft_match(..) [OR ...]` as a conjunct, all
  *     branches on the same doc-id column → ONE semi-join against the
  *     UNION of the lookups (semi-join membership is duplicate-tolerant,
  *     so no dedup shuffle is added; each branch keeps its own term-pruned
  *     scan, and branches may target different index dirs).
  *   A marker mixed with a non-marker under OR (`graft_match(..) OR
  *   lang='en'`) still fails: the disjunct has no index-backed docId-set
  *   form.
  *
  * The lookup subtree is taken in OPTIMIZED form (its own QueryExecution
  * runs first), so its parquet scans already carry the term-pruned
  * `PushedFilters` regardless of which optimizer batch this rule runs in.
  * Building it costs driver-side planning only — query parsing and plan
  * construction; no job runs at rewrite time (escalation stays disabled on
  * this path: SQL semantics are plain match, like `--match_escalation_threshold -1`).
  *
  * Readers cache per index dir (manifest read once per session).
  */
case class IndexMatchRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def lookupPlan(dirE: Expression, queryE: Expression): LogicalPlan = {
    val dir = GraftSql.litString(dirE, "graft_match", "indexDir")
    val query = GraftSql.litString(queryE, "graft_match", "query")
    val reader = GraftSql.readerFor(spark, dir)
    QueryExec.run(reader, query)
      .toDF("docId", "_score").select("docId")
      .queryExecution.optimizedPlan
  }

  /** An OR-tree whose EVERY branch is a marker on the same doc-id column:
    * the docId-set of the disjunction is the union of the lookups.
    */
  private def asMatchDisjunction(e: Expression): Option[Seq[GraftSql.GraftMatch]] = {
    val ds = splitDisjunctivePredicates(e)
    val ms = ds.collect { case m: GraftSql.GraftMatch => m }
    if (ms.length == ds.length && ms.length >= 2 &&
      ms.forall(_.docId.semanticEquals(ms.head.docId))) Some(ms)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child)
        if cond.exists(_.isInstanceOf[GraftSql.GraftMatch]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // each semi group is one join: a single marker, or an OR of markers
      // whose lookups union; antis are `NOT graft_match(..)` conjuncts
      val semis = Seq.newBuilder[Seq[GraftSql.GraftMatch]]
      val antis = Seq.newBuilder[GraftSql.GraftMatch]
      val rest = Seq.newBuilder[Expression]
      var nMarkers = 0
      conjuncts.foreach {
        case m: GraftSql.GraftMatch => semis += Seq(m); nMarkers += 1
        case Not(m: GraftSql.GraftMatch) => antis += m; nMarkers += 1
        case e => asMatchDisjunction(e) match {
          case Some(ms) => semis += ms; nMarkers += 1
          case None =>
            if (e.exists(_.isInstanceOf[GraftSql.GraftMatch]))
              // a marker mixed with non-markers under OR (or deeper inside
              // an expression) has no index-backed docId-set form — fail
              // with an actionable message, not the generic unevaluable
              throw new UnsupportedOperationException(
                "graft_match must be a top-level AND conjunct of the WHERE " +
                  "clause, a NOT of one, or an OR whose every branch is a " +
                  s"graft_match on the same doc-id column: $e")
            rest += e
        }
      }
      assert(nMarkers > 0) // cond contains a marker, so one branch consumed it
      def keyOf(docId: Expression): Expression =
        if (docId.dataType == LongType) docId else Cast(docId, LongType)
      def lookupFor(ms: Seq[GraftSql.GraftMatch]): LogicalPlan =
        ms.map(m => lookupPlan(m.dir, m.query))
          .reduce((a, b) =>
            org.apache.spark.sql.catalyst.plans.logical.Union(Seq(a, b)))
      val withSemis = semis.result().foldLeft(child) { (acc, ms) =>
        val lookup = lookupFor(ms)
        Join(acc, lookup, LeftSemi,
          Some(EqualTo(keyOf(ms.head.docId), lookup.output.head)), JoinHint.NONE)
      }
      val joined = antis.result().foldLeft(withSemis) { (acc, m) =>
        val lookup = lookupPlan(m.dir, m.query)
        Join(acc, lookup, LeftAnti,
          Some(EqualTo(keyOf(m.docId), lookup.output.head)), JoinHint.NONE)
      }
      val restE = rest.result()
      if (restE.isEmpty) joined
      else Filter(restE.reduce(org.apache.spark.sql.catalyst.expressions.And), joined)
  }
}

/** `spark.sql.extensions=graft.sql.GraftExtensions`: the config-route
  * installer (runs at session build, works on every session of the
  * context). Injects the `graft_match` function and [[IndexMatchRewrite]]
  * into the operator-optimization batch.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftSql.functionDescription)
    ext.injectTableFunction(GraftSql.searchTvfDescription)
    ext.injectTableFunction(GraftSql.bm25TvfDescription)
    ext.injectTableFunction(GraftSql.logicalCountTvfDescription)
    ext.injectTableFunction(GraftSql.logicalRangeTvfDescription)
    ext.injectTableFunction(GraftSql.cacheLimitTvfDescription)
    ext.injectTableFunction(GraftSql.metricsTvfDescription)
    ext.injectOptimizerRule(s => IndexMatchRewrite(s))
  }
}
