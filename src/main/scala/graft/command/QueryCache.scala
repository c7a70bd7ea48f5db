package graft.command

import graft.index.IndexReader
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Query-result cache for the select/serving path — the analogue of the
  * reference's grn_cache: an LRU keyed on the FULL select parameter set
  * (reference lib/proc/proc_select.c:571-657 builds the key from every
  * parameter; :655 grn_cache_fetch short-circuits execution on a hit).
  *
  * Entries hold the MATERIALIZED result rows. Select results are bounded by
  * offset/limit on the serving path (as the reference's are), so an entry
  * is pages, not tables. A hit rebuilds the result as LocalRelation
  * DataFrames — downstream `.collect()`/iteration submits NO Spark job,
  * which is the whole point at serving QPS: repeated identical selects cost
  * a map lookup instead of a job.
  *
  * Invalidation is by construction: the key includes
  * [[IndexReader.cacheEpoch]], which changes on rebuild/compaction
  * (manifest rewrite) and on tombstone appends — the reference clears its
  * cache on DB modification for the same reason. Stale entries simply stop
  * being addressable and age out of the LRU.
  *
  * The default capacity mirrors the reference's
  * GRN_CACHE_DEFAULT_MAX_N_ENTRIES (lib/grn_cache.h) = 100.
  */
object QueryCache {

  /** Maximum cached results; eldest-accessed evicts beyond this. */
  @volatile var maxEntries: Int = 100

  /** Byte budget across ALL entries. Entries materialize their result
    * pages on the driver, so a count bound alone could pin GBs of heap
    * (100 entries × a 10⁶-row page); the reference bounds its cache and
    * exposes `cache_limit` (lib/proc.c registration, lib/grn_cache.h) —
    * this is the byte-accounted analogue. Eldest-accessed entries evict
    * until the total fits.
    */
  @volatile var maxBytes: Long = 64L * 1024 * 1024

  /** Single-entry cap: a page estimated above this is NOT cached at all
    * (the refuse-to-cache path — same discipline LocalServing.oversized
    * applies to postings); the result is still served, job-free, from the
    * materialized rows of that one call.
    */
  @volatile var maxEntryBytes: Long = 8L * 1024 * 1024

  private final case class Entry(
      nHits: Long,
      hitRows: Array[Row],
      hitSchema: StructType,
      dds: Map[String, (Array[Row], StructType)],
      totals: Map[String, Long]) {
    /** Memoized LocalRelation rebuild (per session): repeated hits return
      * the same immutable DataFrames, so a hit is a map lookup and the
      * DataFrame's own cached QueryExecution — no re-analysis per fetch.
      */
    @volatile var rebuilt: (SparkSession, SelectResult) = null

    /** Estimated driver-heap footprint of the entry — DOUBLED over the raw
      * row estimate because a served entry also pins its memoized
      * LocalRelation rebuild ([[rebuilt]]): `createDataFrame` converts the
      * external Rows to InternalRows of comparable size, so the true pin
      * of a hot entry is ~2× the stored rows. Budgets are checked against
      * this honest figure.
      */
    lazy val sizeBytes: Long =
      2 * (org.apache.spark.util.SizeEstimator.estimate(hitRows) +
        dds.valuesIterator.map(v =>
          org.apache.spark.util.SizeEstimator.estimate(v._1)).sum)
  }

  private val lru = new java.util.LinkedHashMap[String, Entry](32, 0.75f, true)

  private var nHit = 0L
  private var nMiss = 0L
  private var nOversized = 0L
  private var totalBytes = 0L

  /** (hits, misses) since the last [[clear]]. */
  def stats: (Long, Long) = lru.synchronized((nHit, nMiss))

  /** Bytes currently held across all entries (estimated). */
  def currentBytes: Long = lru.synchronized(totalBytes)

  /** Pages refused because they exceeded [[maxEntryBytes]]. */
  def oversizedCount: Long = lru.synchronized(nOversized)

  def clear(): Unit = lru.synchronized {
    lru.clear(); nHit = 0L; nMiss = 0L; nOversized = 0L; totalBytes = 0L
  }

  /** `cache_limit` (reference lib/proc.c cache_limit command): set the
    * byte budget — evicting immediately to fit — and return the PREVIOUS
    * budget, the reference command's reply shape.
    */
  def setMaxBytes(b: Long): Long = lru.synchronized {
    require(b > 0, s"cache byte budget must be positive, got $b")
    val prev = maxBytes
    maxBytes = b
    evictToBudget()
    prev
  }

  /** One-row ops snapshot of the result cache — hit/miss/refusal counts
    * and budget occupancy (the reference's status command reports its
    * grn_cache the same way).
    */
  def metricsDF(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val (h, m, o, e, b) = lru.synchronized(
      (nHit, nMiss, nOversized, lru.size().toLong, totalBytes))
    Seq((h, m, o, e, b, maxBytes, maxEntryBytes)).toDF(
      "hits", "misses", "oversized", "entries", "bytes",
      "max_bytes", "max_entry_bytes")
  }

  /** Evict eldest-accessed entries until both the count and byte budgets
    * hold (caller holds the lock).
    */
  private def evictToBudget(): Unit = {
    val it = lru.entrySet().iterator()
    while ((lru.size() > maxEntries || totalBytes > maxBytes) && it.hasNext) {
      totalBytes -= it.next().getValue.sizeBytes
      it.remove()
    }
  }

  /** Unique ids for UDF function objects: Column.toString renders every
    * ScalaUDF as `UDF(args)` regardless of WHICH function it wraps, so two
    * different UDF filters over the same column would render — and key —
    * identically. Appending a per-function-object id restores the
    * false-HIT-impossible property: the same UserDefinedFunction applied
    * twice keys equal (same function object), a different lambda keys
    * apart. WeakHashMap so retired UDFs don't pin their closures.
    */
  private val fnIds = new java.util.WeakHashMap[AnyRef, java.lang.Long]()
  private var nextFnId = 0L
  private def fnIdOf(f: AnyRef): Long = fnIds.synchronized {
    val got = fnIds.get(f)
    if (got != null) got.longValue
    else { nextFnId += 1; fnIds.put(f, nextFnId); nextFnId }
  }

  /** Fingerprint of a Column's expression tree beyond its toString: the
    * identity of every embedded UDF (see [[fnIdOf]]). None when the tree
    * contains a NON-DETERMINISTIC node (rand() etc.) — such a select is
    * not cacheable at all (serving a prior run's rows would freeze the
    * randomness), so [[fetch]] bypasses the cache entirely.
    */
  private def fingerprint(
      c: org.apache.spark.sql.Column, knownCols: Set[String],
      caseSensitive: Boolean): Option[String] =
    org.apache.spark.sql.GraftColumnBridge
      .udfIdentities(c, knownCols, caseSensitive).map {
        case Seq() => ""
        case fns => fns.map(fnIdOf).mkString("#udf[", ",", "]")
      }

  /** Cache key = index identity + content epoch + the rendered parameter
    * set (SelectParams is a case class; Column parameters render their
    * expression trees) + a fingerprint per Column parameter covering what
    * toString cannot (UDF identity — see [[fingerprint]]). Structurally
    * identical filters key equal, different ones key apart: an
    * unparseable-corner false MISS is safe, a false HIT is not possible.
    * None = not cacheable (a non-deterministic expression parameter).
    *
    * STRING parameters that Select lowers through the SQL parser (`scorer`,
    * `sortby` keys, `outputColumns` entries) are fingerprinted too —
    * `sortby = Seq("rand()")` must bypass the cache exactly like
    * `sortByCols = Seq(rand())` would (the string itself is already in
    * `$p` for key uniqueness; the parse here is only the determinism
    * check). Paren-less entries lower as columns, which the fingerprint
    * still inspects: a bare `current_date` output column resolves as a
    * LITERAL FUNCTION when no such doc column exists, and must bypass
    * like the called form. The adjuster grammar (`col @ "value" *
    * factor`) admits no function calls, so it needs no parse.
    */
  private def keyOf(reader: IndexReader, p: SelectParams): Option[String] = {
    import org.apache.spark.sql.functions.{col, expr}
    def lower(k: String) = if (k.contains('(')) expr(k) else col(k)
    val stringExprs =
      p.scorer.map(expr).toSeq ++
        (if (p.sortByCols.isEmpty)
          p.sortby.map(k => if (k.startsWith("-")) k.drop(1) else k.stripPrefix("+"))
            .map(lower)
        else Nil) ++
        (if (p.outputExprs.isEmpty)
          p.outputColumns.filterNot(_ == "*").map(lower)
        else Nil)
    val cols = p.filter.toSeq ++ p.filterScore.toSeq ++
      p.scorerAssigns.map(_._2) ++ p.outputExprs.toSeq.flatten.map(_._2) ++
      p.sortByCols.toSeq.flatten ++ stringExprs
    // a bare attribute that IS a doc column resolves as that column (the
    // analyzer prefers columns over literal functions), so such names must
    // not trip the literal-function deny — a corpus with a `user` column
    // would otherwise never cache. Name matching follows the session's
    // spark.sql.caseSensitive: exact when case-sensitive (a `USER` column
    // does NOT shadow a bare `user`, which then resolves as the
    // session_user literal function and must bypass the cache).
    val caseSensitive = reader.spark.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    val knownCols =
      if (caseSensitive) reader.docs.schema.fieldNames.toSet
      else reader.docs.schema.fieldNames.map(_.toLowerCase).toSet
    // a script-syntax filter calling rand()/now() is non-deterministic
    // exactly like the Column form — deny by Ast walk, not string match
    if (p.filterScript.exists(s => !graft.script.ScriptExpr.isDeterministic(s)))
      return None
    val fps = cols.map(fingerprint(_, knownCols, caseSensitive))
    if (fps.exists(_.isEmpty)) None
    else Some(s"${reader.dir}\u0001${reader.cacheEpoch}\u0001$p\u0001" +
      fps.flatten.mkString(";"))
  }

  /** Look up `p` for `reader`; on a miss run `exec`, materialize and store.
    * Returns a result whose DataFrames are local relations in BOTH cases
    * (the miss path materializes anyway to populate the cache).
    */
  def fetch(reader: IndexReader, p: SelectParams)(exec: => SelectResult): SelectResult = {
    val key = keyOf(reader, p) match {
      case Some(k) => k
      case None => return exec // non-deterministic parameter: not cacheable
    }
    val cached = lru.synchronized {
      val e = Option(lru.get(key))
      if (e.isDefined) nHit += 1 else nMiss += 1
      e
    }
    val entry = cached.getOrElse {
      val res = exec
      val e = Entry(
        res.nHits,
        res.hits.collect(), res.hits.schema,
        res.drilldowns.map { case (k, df) => k -> (df.collect(), df.schema) },
        res.drilldownTotals)
      if (e.sizeBytes > maxEntryBytes) {
        // refuse-to-cache: the page is served from this call's rows but
        // never pins the budget (and never evicts smaller useful entries)
        lru.synchronized { nOversized += 1 }
      } else lru.synchronized {
        val prev = lru.put(key, e)
        if (prev != null) totalBytes -= prev.sizeBytes
        totalBytes += e.sizeBytes
        evictToBudget()
      }
      e
    }
    rebuild(reader.spark, entry)
  }

  private def rebuild(spark: SparkSession, e: Entry): SelectResult = {
    val memo = e.rebuilt
    if (memo != null && (memo._1 eq spark)) return memo._2
    import scala.jdk.CollectionConverters._
    val res = SelectResult(
      e.nHits,
      spark.createDataFrame(e.hitRows.toSeq.asJava, e.hitSchema),
      e.dds.map { case (k, (rows, schema)) =>
        k -> spark.createDataFrame(rows.toSeq.asJava, schema)
      },
      e.totals)
    e.rebuilt = (spark, res)
    res
  }
}
