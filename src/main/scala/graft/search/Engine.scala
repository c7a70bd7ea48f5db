package graft.search

import graft.codec.Norms
import graft.index.{IndexReader, SegmentRow}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed query execution over the sharded index.
  *
  * Layout rationale (100 TB design): each shard is a complete sub-index for a
  * docId range. A query touches only the segment rows of its terms (parquet
  * predicate pushdown on `term`), grouped by shard — every shard evaluates
  * independently in parallel (the intra-query parallelism Groonga lacks,
  * SURVEY.md §4.2) and emits at most its local top-k; the global answer is a
  * tree-reduce of k-heaps via [[TopKAgg]]. No shuffle touches posting data
  * larger than the per-shard candidate lists.
  */
object Engine {

  /** Full-text match with reference score semantics:
    * `_score = (noccur + tscore) * weight` (reference lib/ii.c:6984, tscore=0
    * without stored weights). Multi-token text is a phrase match, like
    * Groonga's `column @ "multi word"` (reference lib/ii.c:6941-6973).
    */
  def matchScores(
      reader: IndexReader,
      text: String,
      kind: MatchKind = PhraseMatch,
      weight: Double = 1.0
  ): Dataset[ScoredDoc] = {
    val spark = reader.spark
    import spark.implicits._
    val qtoks = Searcher.queryTokens(reader, text)
    if (qtoks.isEmpty) return spark.emptyDataset[ScoredDoc]
    val withPos = reader.manifest.withPositions
    val terms = qtoks.map(_.term)
    reader.segmentsFor(terms)
      .groupByKey(_.shard)
      .flatMapGroups { (_, rows) =>
        Searcher.evalShardMatch(qtoks, rows.toSeq, withPos, kind)
          .map { case (d, n) => ScoredDoc(d, n * weight) }
      }
  }

  /** Disjunctive (bag-of-terms) top-k BM25 — the north-star query path.
    * Per-shard evaluation cogroups the query's segment rows with the shard's
    * norms sidecar; WAND prunes on block-max bounds; [[TopKAgg]] merges.
    */
  def bm25TopK(
      reader: IndexReader,
      text: String,
      k: Int,
      useWand: Boolean = true,
      bm25: Bm25 = Bm25()
  ): Dataset[ScoredDoc] = {
    val spark = reader.spark
    import spark.implicits._
    val qtoks = Searcher.queryTokens(reader, text)
    if (qtoks.isEmpty) return spark.emptyDataset[ScoredDoc]
    val terms = qtoks.map(_.term).distinct
    val stats = reader.termStats(terms) // tiny: one row per query term
    val n = reader.manifest.numDocs
    val avgdl = reader.manifest.avgDoclen
    val withPos = reader.manifest.withPositions
    // stable term order → bit-identical float sums in every path
    val termIdx: Map[String, Int] = terms.zipWithIndex.toMap
    val idfs: Map[String, Double] =
      terms.map(t => t -> bm25.idf(n, stats.get(t).map(_._1).getOrElse(0L))).toMap

    val segsByShard = reader.segmentsFor(terms).groupByKey(_.shard)
    val normsByShard = reader.norms.groupByKey(_._1)

    val perShard = segsByShard.cogroup(normsByShard) { (_, segIt, normIt) =>
      val segRows = segIt.toSeq
      if (segRows.isEmpty) Iterator.empty
      else {
        val lookup = {
          val ns = normIt.toSeq
          require(ns.nonEmpty, "missing norms row for shard")
          Norms.decode(ns.head._2)
        }
        val cursors = segRows.groupBy(_.term).toSeq
          .map { case (t, rows) =>
            TermCursor.fromRows(rows, withPos, termIdx(t), idfs(t), bm25)
          }
          .sortBy(_.termIdx)
        val top =
          if (useWand) Bm25Shard.wand(cursors, lookup.apply, avgdl, bm25, k)
          else Bm25Shard.exhaustive(cursors, lookup.apply, avgdl, bm25, k)
        top.iterator
      }
    }
    topK(perShard, k)
  }

  /** Global top-k via the typed k-heap aggregator. */
  def topK(scored: Dataset[ScoredDoc], k: Int): Dataset[ScoredDoc] = {
    val spark = scored.sparkSession
    import spark.implicits._
    val buf = scored.select(new TopKAgg(k).toColumn).head()
    spark.createDataset(buf.items)
  }

  /** Set algebra on scored result sets (reference grn_table_setoperation,
    * lib/db.c:4195-4306 + res_add lib/ii.c:6029): scores ADD on collision.
    */
  object SetOps {
    private def df(ds: Dataset[ScoredDoc], nm: String): DataFrame =
      ds.toDF("docId", nm)

    /** OR: union, scores add (GRN_OP_OR). */
    def or(a: Dataset[ScoredDoc], b: Dataset[ScoredDoc]): Dataset[ScoredDoc] = {
      val spark = a.sparkSession
      import spark.implicits._
      df(a, "s1").join(df(b, "s2").withColumnRenamed("docId", "docId2"),
          col("docId") === col("docId2"), "full_outer")
        .select(
          coalesce(col("docId"), col("docId2")).as("docId"),
          (coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0))).as("score"))
        .as[ScoredDoc]
    }

    /** AND: intersection, scores add (GRN_OP_AND). */
    def and(a: Dataset[ScoredDoc], b: Dataset[ScoredDoc]): Dataset[ScoredDoc] = {
      val spark = a.sparkSession
      import spark.implicits._
      df(a, "s1").join(df(b, "s2").withColumnRenamed("docId", "docId2"),
          col("docId") === col("docId2"), "inner")
        .select(col("docId"), (col("s1") + col("s2")).as("score"))
        .as[ScoredDoc]
    }

    /** AND_NOT: difference, removed side's score ignored (GRN_OP_AND_NOT). */
    def andNot(a: Dataset[ScoredDoc], b: Dataset[ScoredDoc]): Dataset[ScoredDoc] = {
      val spark = a.sparkSession
      import spark.implicits._
      df(a, "score").join(df(b, "s2"), Seq("docId"), "left_anti")
        .as[ScoredDoc]
    }

    /** ADJUST: keep left set, add right score for members (GRN_OP_ADJUST). */
    def adjust(a: Dataset[ScoredDoc], b: Dataset[ScoredDoc]): Dataset[ScoredDoc] = {
      val spark = a.sparkSession
      import spark.implicits._
      df(a, "s1").join(df(b, "s2"), Seq("docId"), "left_outer")
        .select(col("docId"), (col("s1") + coalesce(col("s2"), lit(0.0))).as("score"))
        .as[ScoredDoc]
    }
  }
}
