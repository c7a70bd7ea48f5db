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
    s"${sys.props("java.io.tmpdir")}/graft-docindex-v2/$tag"
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
}
