package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Read-side handle over a built index directory. */
final class IndexReader(val spark: SparkSession, val dir: String) extends Serializable {

  val manifest: IndexManifest =
    IndexManifest.fromJson(Files.readString(Paths.get(dir, "manifest.json")))

  def segments: Dataset[SegmentRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/segments").as[SegmentRow]
  }

  /** Segment rows for the given terms only — `isin` predicate is pushed down
    * to the parquet scan (row-group pruning on the term column).
    */
  def segmentsFor(terms: Seq[String]): Dataset[SegmentRow] = {
    import spark.implicits._
    segments.filter(col("term").isin(terms.distinct: _*))
  }

  def docs: DataFrame = spark.read.parquet(s"$dir/docs")

  /** Per-shard doclen sidecar rows: (shard, varint blob). */
  def norms: Dataset[(Int, Array[Byte])] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/norms").as[(Int, Array[Byte])]
  }

  def lexicon: DataFrame = spark.read.parquet(s"$dir/lexicon")

  def metrics: DataFrame = spark.read.parquet(s"$dir/metrics")

  /** Global (df, cf) for query terms — small collect, broadcast by caller. */
  def termStats(terms: Seq[String]): Map[String, (Long, Long)] = {
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

  /** Re-verify the per-row content digest invariant against the manifest
    * (north rule: every stage preserves content sha256 vs the source).
    */
  def verifyShaInvariant(): Boolean = {
    val cur = docs.agg(
      sum(conv(substring(col("sha256"), 1, 8), 16, 10).cast("long"))).collect()(0).getLong(0)
    cur == manifest.contentShaXor
  }
}
