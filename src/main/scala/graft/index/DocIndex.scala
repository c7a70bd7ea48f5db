package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Build-once cache of the inverted index over a testdata `documents` table
  * (doc_id, text, lang, source, n_chars). The documents corpus is
  * whitespace-word text, so the index uses TokenDelimit — tokenization is
  * exactly `split(' ')`, which keeps the DuckDB oracle SQL expressible.
  *
  * The index directory is derived from the sf dir; the resumable build
  * (stage markers) makes repeated calls cheap within and across processes.
  */
object DocIndex {

  private val cache = scala.collection.mutable.Map[String, IndexReader]()

  def indexDir(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    // v5: manifest gained builtFromContent (pre-field manifests read as
    // false, disabling the scan-verify escape on cached indexes)
    s"${sys.props("java.io.tmpdir")}/graft-docindex-v5/$tag"
  }

  def reader(spark: SparkSession, sfDir: String): IndexReader = synchronized {
    cache.getOrElseUpdate(sfDir, {
      val dir = indexDir(sfDir)
      if (!Files.exists(Paths.get(dir, "manifest.json"))) {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").as("docId"), col("text").as("content"),
            col("lang"), col("source"), col("n_chars"))
        IndexBuilder.build(spark, docs, dir,
          IndexConfig(tokenizerName = "TokenDelimit", withPositions = true,
            nShards = 8, buildPartitions = 16, nSalts = 4,
            hotTermDf = 1000000L))
      }
      new IndexReader(spark, dir)
    })
  }

  private val rxCache = scala.collection.mutable.Map[String, IndexReader]()

  /** Raw overlapping-bigram index over documents.text — the TokenRegexp
    * analogue backing index-assisted regexp search (every 2-char substring
    * is a term; reference lib/tokenizers.c:470 TokenRegexp).
    */
  def regexReader(spark: SparkSession, sfDir: String): IndexReader = synchronized {
    rxCache.getOrElseUpdate(sfDir, {
      val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
      val dir = s"${sys.props("java.io.tmpdir")}/graft-docindex-rx-v2/$tag"
      if (!Files.exists(Paths.get(dir, "manifest.json"))) {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").as("docId"), col("text").as("content"))
        IndexBuilder.build(spark, docs, dir,
          IndexConfig(tokenizerName = "TokenBigram:none", withPositions = true,
            nShards = 8, buildPartitions = 16, nSalts = 4,
            hotTermDf = 1000000L))
      }
      new IndexReader(spark, dir)
    })
  }

  private val secCache = scala.collection.mutable.Map[String, SectionedReader]()

  /** Sectioned variant: text + source each indexed as a section
    * (match_columns multi-column queries).
    */
  def sectionedReader(spark: SparkSession, sfDir: String): SectionedReader = synchronized {
    secCache.getOrElseUpdate(sfDir, {
      val tag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
      val dir = s"${sys.props("java.io.tmpdir")}/graft-docindex-sec-v2/$tag"
      if (!Files.exists(Paths.get(dir, "_sections"))) {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").as("docId"), col("text"),
            col("lang"), col("source"), col("n_chars"))
        SectionedIndex.build(spark, docs, dir,
          IndexConfig(tokenizerName = "TokenDelimit", withPositions = true,
            nShards = 8, buildPartitions = 16, nSalts = 4,
            hotTermDf = 1000000L),
          sections = Seq("text", "source"))
      }
      SectionedIndex.open(spark, dir)
    })
  }
}
