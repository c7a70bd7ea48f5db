package graft.search

import graft.SparkTestBase
import graft.index.{IndexBuilder, IndexConfig, IndexReader}
import org.scalatest.funsuite.AnyFunSuite

/** GRN_OP_TERM_EXTRACT: greedy longest-match lexicon extraction. */
class TermExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val reader = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tx_").toString
    val rows = Seq(
      (0L, "spark sql engine"),
      (1L, "sparkle fast engine"),
      (2L, "streaming data")
    )
    IndexBuilder.build(spark, rows.toDF("docId", "content"), d,
      IndexConfig(tokenizerName = "TokenDelimit", nShards = 2,
        buildPartitions = 2, hotTermDf = 1000, nSalts = 2))
    new IndexReader(spark, d)
  }

  // NOTE: NormalizerAuto removes blanks (reference GRN_STRING_REMOVE_BLANK),
  // so extraction offsets are positions in the blank-removed normalized text.
  test("longest match wins and extraction advances past it") {
    // lexicon has both "spark" and "sparkle" — longest-match picks sparkle
    val got = TermExtract.termExtract(reader, "sparkle spark!")
    assert(got == Seq(("sparkle", 0), ("spark", 7)))
  }

  test("input is normalized with the index's chain before extraction") {
    val got = TermExtract.termExtract(reader, "SPARK Engine")
    assert(got == Seq(("spark", 0), ("engine", 5)))
  }

  test("non-lexicon spans are skipped") {
    val got = TermExtract.termExtract(reader, "xyz data qqq")
    assert(got.map(_._1) == Seq("data"))
  }

  test("distributed column variant matches driver-side extraction") {
    import spark.implicits._
    val df = Seq((10L, "fast streaming spark"), (11L, "nothing here")).toDF("id", "txt")
    val got = TermExtract.termExtractColumn(reader, df, "id", "txt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((10L, "fast", 0), (10L, "streaming", 4), (10L, "spark", 13)))
  }

  test("partitioned (join-based) variant == broadcast variant") {
    import spark.implicits._
    val df = Seq(
      (10L, "fast streaming spark"),
      (11L, "nothing here"),
      (12L, "SPARKLE spark data engine"), // longest-match + normalization
      (13L, "")
    ).toDF("id", "txt")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val bc = rows(TermExtract.termExtractColumn(reader, df, "id", "txt"))
    val part = rows(TermExtract.termExtractColumnPartitioned(reader, df, "id", "txt"))
    assert(part == bc)
    assert(bc.contains((12L, "sparkle", 0)) && bc.contains((12L, "spark", 7)))
  }

  test("partitioned variant matches terms with supplementary (non-BMP) chars") {
    import spark.implicits._
    // a 3-codepoint emoji term is 6 UTF-16 units: a candidate-length cap
    // computed in CODEPOINTS (Spark length()) would truncate its candidates
    // and silently never match it in the join path
    val d = java.nio.file.Files.createTempDirectory("graft_tx_emoji_").toString
    val docs = Seq((0L, "😀😀😀 data")).toDF("docId", "content")
    IndexBuilder.build(spark, docs, d,
      IndexConfig(tokenizerName = "TokenDelimit", nShards = 1,
        buildPartitions = 1, hotTermDf = 1000, nSalts = 1))
    val rdr = new IndexReader(spark, d)
    val df = Seq((0L, "😀😀😀 data")).toDF("id", "txt")
    def rows(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val bc = rows(TermExtract.termExtractColumn(rdr, df, "id", "txt"))
    val part = rows(TermExtract.termExtractColumnPartitioned(rdr, df, "id", "txt"))
    assert(part == bc, s"partitioned $part != broadcast $bc")
    assert(part.exists(_._2 == "😀😀😀"),
      s"supplementary-char term not extracted: $part")
  }
}
