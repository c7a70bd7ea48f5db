package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Read-side handle over a built index directory. */
class IndexReader(val spark: SparkSession, val dir: String) extends Serializable {

  val manifest: IndexManifest =
    IndexManifest.fromJson(Files.readString(Paths.get(dir, "manifest.json")))

  /** Cached relation handle — file listing + schema resolve once per
    * session, so repeated queries only pay the pruned scan itself.
    */
  lazy val segments: Dataset[SegmentRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/segments").as[SegmentRow]
  }

  /** Segment rows for the given terms only. The segments table is written
    * term-major (range-partitioned + sorted by term), so the `isin`
    * predicate pushes down to the parquet scan and row-group min/max stats
    * prune everything but the files/row-groups actually holding the query's
    * terms — the scan cost is O(matching postings), not O(index).
    */
  def segmentsFor(terms: Seq[String]): Dataset[SegmentRow] = {
    import spark.implicits._
    segments.filter(col("term").isin(terms.distinct: _*))
  }

  /** Serving mode: pin the segments relation in executor memory — the Spark
    * analogue of Groonga's always-mmap'd index files (reference lib/io.c).
    * Repeated queries then scan the in-memory columnar cache instead of
    * re-reading parquet; on a cluster the cache is partitioned across
    * executors. Call once before a query workload; returns this.
    */
  def cacheForServing(): this.type = {
    segments.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    segments.count(): Unit // materialize
    normsBroadcast // ship norms once
    lexiconWarm()
    this
  }

  private def lexiconWarm(): Unit = { lexiconMap.size: Unit }

  lazy val docs: DataFrame = spark.read.parquet(s"$dir/docs")

  /** Docs minus tombstones — what scan-based query paths see. */
  def liveDocs: DataFrame =
    if (deletedIds.isEmpty) docs
    else docs.join(Deletes.deletedIdsDf(spark, dir), Seq("docId"), "left_anti")

  /** Per-shard doclen sidecar rows: (shard, varint blob). */
  lazy val norms: Dataset[(Int, Array[Byte])] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/norms").as[(Int, Array[Byte])]
  }

  /** Broadcast per-shard norms blobs (decoded lazily per executor task).
    * Size = one varint per doc (~2-4 B): fine to ship whole for sandbox
    * scales; at 10^12 docs the per-shard blob is instead co-read with the
    * shard's segment rows (the [[graft.search.Engine.bm25TopK]] cogroup
    * path, kept for that regime).
    */
  lazy val normsBroadcast: org.apache.spark.broadcast.Broadcast[Map[Int, Array[Byte]]] = {
    import spark.implicits._
    spark.sparkContext.broadcast(norms.collect().toMap)
  }

  lazy val lexicon: DataFrame = spark.read.parquet(s"$dir/lexicon")

  // ---- tombstones (Deletes.delete) --------------------------------------
  @volatile private var deletedCache: Option[scala.collection.immutable.Set[Long]] = None

  /** Tombstoned docIds (empty set when none). Cached per reader; call
    * [[invalidateDeletes]] after Deletes.delete on the same reader.
    */
  def deletedIds: Set[Long] = {
    deletedCache match {
      case Some(s) => s
      case None =>
        val s: Set[Long] =
          if (java.nio.file.Files.exists(Paths.get(dir, "deletes"))) {
            import spark.implicits._
            spark.read.parquet(s"$dir/deletes").select("docId").as[Long]
              .collect().toSet
          } else Set.empty[Long]
        deletedCache = Some(s)
        s
    }
  }

  def invalidateDeletes(): Unit = { deletedCache = None; deletedBCache = None }

  @volatile private var deletedBCache: Option[org.apache.spark.broadcast.Broadcast[Set[Long]]] = None

  /** Broadcast tombstone set for executor-side filtering. */
  def deletedBroadcast: org.apache.spark.broadcast.Broadcast[Set[Long]] = {
    deletedBCache match {
      case Some(b) => b
      case None =>
        val b = spark.sparkContext.broadcast(deletedIds)
        deletedBCache = Some(b)
        b
    }
  }

  lazy val metrics: DataFrame = spark.read.parquet(s"$dir/metrics")

  /** Driver-cached lexicon stats: term -> (df, cf). The lexicon of a code
    * corpus is orders of magnitude smaller than the postings (zipf); for
    * corpora where it isn't, swap for the pruned-scan [[termStatsScan]].
    */
  private lazy val lexiconMap: Map[String, (Long, Long)] =
    lexicon.collect()
      .map(r => r.getString(r.fieldIndex("term")) ->
        (r.getLong(r.fieldIndex("df")), r.getLong(r.fieldIndex("cf"))))
      .toMap

  /** Global (df, cf) for query terms. */
  def termStats(terms: Seq[String]): Map[String, (Long, Long)] =
    terms.distinct.flatMap(t => lexiconMap.get(t).map(t -> _)).toMap

  /** Pruned-scan variant of [[termStats]] for lexicons too big to hold. */
  def termStatsScan(terms: Seq[String]): Map[String, (Long, Long)] = {
    lexicon.filter(col("term").isin(terms.distinct: _*))
      .collect()
      .map(r => r.getString(r.fieldIndex("term")) ->
        (r.getLong(r.fieldIndex("df")), r.getLong(r.fieldIndex("cf"))))
      .toMap
  }

  /** Lexicon terms matching a prefix (sorted) — the PAT-trie descendant walk
    * analogue (reference lib/pat.c:1091) as a range predicate.
    */
  def termsWithPrefix(prefix: String, limit: Int = 1000): Seq[String] = {
    import spark.implicits._
    lexicon.filter(col("term").startsWith(prefix))
      .select("term").as[String].orderBy("term").take(limit).toSeq
  }

  /** Lexicon terms ending with `suffix` — prefix predicate on the stored
    * reversed-term column (reference KEY_WITH_SIS suffix search,
    * lib/pat.c:1150). Falls back to endsWith for indexes built before the
    * rev column existed.
    */
  def termsWithSuffix(suffix: String, limit: Int = 1000): Seq[String] = {
    import spark.implicits._
    val pred =
      if (lexicon.columns.contains("rev")) col("rev").startsWith(suffix.reverse)
      else col("term").endsWith(suffix)
    lexicon.filter(pred).select("term").as[String].orderBy("term").take(limit).toSeq
  }

  /** Re-verify the per-row content digest invariant against the manifest
    * (north rule: every stage preserves content sha256 vs the source).
    */
  def verifyShaInvariant(): Boolean = {
    val cur = docs.agg(
      sum(conv(substring(col("sha256"), 1, 8), 16, 10).cast("long"))).collect()(0).getLong(0)
    cur == manifest.contentShaXor
  }
}
