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
  }

  private val lru = new java.util.LinkedHashMap[String, Entry](32, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
      size() > maxEntries
  }

  private var nHit = 0L
  private var nMiss = 0L

  /** (hits, misses) since the last [[clear]]. */
  def stats: (Long, Long) = lru.synchronized((nHit, nMiss))

  def clear(): Unit = lru.synchronized { lru.clear(); nHit = 0L; nMiss = 0L }

  /** Cache key = index identity + content epoch + the rendered parameter
    * set (SelectParams is a case class; Column parameters render their
    * expression trees, so structurally identical filters key equal and
    * different ones key apart — an unparseable-corner false MISS is safe,
    * a false HIT is not possible).
    */
  private def keyOf(reader: IndexReader, p: SelectParams): String =
    s"${reader.dir}\u0001${reader.cacheEpoch}\u0001$p"

  /** Look up `p` for `reader`; on a miss run `exec`, materialize and store.
    * Returns a result whose DataFrames are local relations in BOTH cases
    * (the miss path materializes anyway to populate the cache).
    */
  def fetch(reader: IndexReader, p: SelectParams)(exec: => SelectResult): SelectResult = {
    val key = keyOf(reader, p)
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
      lru.synchronized { lru.put(key, e): Unit }
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
