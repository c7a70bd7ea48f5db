package graft.command

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Time-windowed full-text search over the sharded layout: per-shard
  * index builds (incremental), window-pruned shard selection, boundary
  * row trimming, and equality with a flat-corpus search.
  */
class LogicalSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  // 9 docs across 3 days; "apple" tf varies; doc 5 sits mid-day for the
  // boundary trim
  private lazy val root: String = {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01T10:00:00Z", "apple banana apple"),
      (2L, "2024-01-01T11:00:00Z", "banana cherry"),
      (3L, "2024-01-02T01:00:00Z", "apple cherry"),
      (4L, "2024-01-02T02:00:00Z", "date egg"),
      (5L, "2024-01-02T12:00:00Z", "apple apple apple"),
      (6L, "2024-01-03T01:00:00Z", "apple fig"),
      (7L, "2024-01-03T02:00:00Z", "fig grape"),
      (8L, "2024-01-03T03:00:00Z", "apple grape"),
      (9L, "2024-01-03T23:00:00Z", "banana apple")
    ).map { case (id, t, x) => (id, ts(t), x) }.toDF("doc_id", "t", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsearch_").toString + "/t"
    Logical.writeSharded(rows, "t", dir)
    dir
  }

  private def rng(min: String = null, minInc: Boolean = true,
      max: String = null, maxInc: Boolean = true) =
    Logical.LogicalRange(Option(min).map(ts), minInc, Option(max).map(ts), maxInc)

  test("buildIndexes is incremental per shard") {
    val first = LogicalSearch.buildIndexes(spark, root, "doc_id", "text")
    assert(first == Seq("20240101", "20240102", "20240103"))
    assert(LogicalSearch.buildIndexes(spark, root, "doc_id", "text").isEmpty,
      "second call must skip already-indexed shards")
  }

  test("windowed search == flat search over the window, boundary trimmed") {
    LogicalSearch.buildIndexes(spark, root, "doc_id", "text"): Unit
    // window [Jan2 06:00, Jan4): day 2 is a BOUNDARY (docs 3,4 excluded
    // by the row-level trim; doc 5 at 12:00 stays), day 3 is interior
    val got = LogicalSearch.search(spark, root, "t",
      rng("2024-01-02T06:00:00Z", max = "2024-01-04T00:00:00Z",
        maxInc = false), "apple", idCol = "doc_id")
      .select("docId", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(5L -> 3.0, 6L -> 1.0, 8L -> 1.0, 9L -> 1.0), got.toString)
    // out-of-window shards are never opened
    assert(LogicalSearch.shardsInRange(spark, root, "t",
      rng("2024-01-03T00:00:00Z")) == Seq("20240103"))
    // empty window → empty result
    assert(LogicalSearch.search(spark, root, "t",
      rng("2025-01-01T00:00:00Z"), "apple", idCol = "doc_id").count() == 0)
  }

  test("a NEW shard (late arrival) indexes incrementally and serves") {
    import spark.implicits._
    LogicalSearch.buildIndexes(spark, root, "doc_id", "text"): Unit
    val late = Seq((10L, ts("2024-01-04T01:00:00Z"), "apple late"))
      .toDF("doc_id", "t", "text")
    late.withColumn("_shard", date_format(col("t"), "yyyyMMdd"))
      .write.mode("append").partitionBy("_shard").parquet(root)
    assert(LogicalSearch.buildIndexes(spark, root, "doc_id", "text")
      == Seq("20240104"))
    val got = LogicalSearch.search(spark, root, "t",
      rng("2024-01-04T00:00:00Z"), "apple", idCol = "doc_id")
      .select("docId").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L))
  }

  test("bm25TopK: in-window docs below a boundary shard's raw top-k still surface") {
    import spark.implicits._
    // day 1: three OUT-of-window heavy hitters (tf 3) + one in-window
    // doc (tf 1); day 2 interior. Trimming AFTER the shard top-k would
    // lose doc 24 behind the out-of-window docs.
    val rows = Seq(
      (21L, "2024-02-01T01:00:00Z", "apple apple apple pad"),
      (22L, "2024-02-01T02:00:00Z", "apple apple apple pod"),
      (23L, "2024-02-01T03:00:00Z", "apple apple apple ped"),
      (24L, "2024-02-01T20:00:00Z", "apple solo"),
      (25L, "2024-02-02T01:00:00Z", "apple duo")
    ).map { case (id, t, x) => (id, ts(t), x) }.toDF("doc_id", "t", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsearch_bm_").toString + "/t"
    Logical.writeSharded(rows, "t", dir)
    LogicalSearch.buildIndexes(spark, dir, "doc_id", "text"): Unit
    val got = LogicalSearch.bm25TopK(spark, dir, "t",
      rng("2024-02-01T10:00:00Z", max = "2024-02-03T00:00:00Z",
        maxInc = false), "apple", k = 2, idCol = "doc_id")
      .select("docId").collect().map(_.getLong(0)).toSet
    assert(got == Set(24L, 25L), s"in-window doc lost behind trimmed top-k: $got")
  }

  test("globalIdf: merged stats reproduce a flat index bit-for-bit; per-shard drifts") {
    import spark.implicits._
    // term stats DRIFT across days: 'apple' df is 2/3 on day 1, 1/3 on
    // day 2; every doc is 2 tokens so tf-normalization is identical
    val rows = Seq(
      (31L, "2024-03-01T01:00:00Z", "apple xx"),
      (32L, "2024-03-01T02:00:00Z", "apple yy"),
      (33L, "2024-03-01T03:00:00Z", "zed ww"),
      (34L, "2024-03-02T01:00:00Z", "apple zz"),
      (35L, "2024-03-02T02:00:00Z", "quux vv"),
      (36L, "2024-03-02T03:00:00Z", "quux uu")
    ).map { case (id, t, x) => (id, ts(t), x) }.toDF("doc_id", "t", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsearch_gidf_").toString + "/t"
    Logical.writeSharded(rows, "t", dir)
    LogicalSearch.buildIndexes(spark, dir, "doc_id", "text"): Unit
    val w = rng("2024-03-01T00:00:00Z", max = "2024-03-03T00:00:00Z",
      maxInc = false) // shard-aligned: both days interior
    def scores(globalIdf: Boolean): Map[Long, Double] =
      LogicalSearch.bm25TopK(spark, dir, "t", w, "apple", k = 6,
          idCol = "doc_id", globalIdf = globalIdf)
        .select("docId", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // per-shard idf: day-2's lone 'apple' doc outranks day-1's despite
    // identical tf and doclen — the cross-shard comparability artifact
    val perShard = scores(globalIdf = false)
    assert(perShard(34L) > perShard(31L), perShard.toString)
    // global idf: all three 'apple' docs score EQUAL, and every score is
    // bit-identical to one flat index over the same six rows
    val global = scores(globalIdf = true)
    assert(global(31L) == global(32L) && global(31L) == global(34L))
    val flatDir = java.nio.file.Files
      .createTempDirectory("graft_lsearch_flat_").toString
    graft.index.IndexBuilder.build(spark,
      rows.select(col("doc_id").as("docId"), col("text").as("content")),
      flatDir, LogicalSearch.defaultConfig)
    val flat = graft.search.Engine
      .bm25TopK(new graft.index.IndexReader(spark, flatDir), "apple", 6)
      .collect().map(s => s.docId -> s.score).toMap
    assert(global == flat, s"global $global\nflat $flat")
  }

  test("bm25TopK merges per-shard top-k by score with boundary trim") {
    LogicalSearch.buildIndexes(spark, root, "doc_id", "text"): Unit
    val got = LogicalSearch.bm25TopK(spark, root, "t",
      rng("2024-01-02T06:00:00Z", max = "2024-01-04T00:00:00Z",
        maxInc = false), "apple", k = 3, idCol = "doc_id")
      .select("docId").collect().map(_.getLong(0)).toSeq
    // doc 5 (tf 3) must rank first; 3 results; docs 3,4 trimmed
    assert(got.size == 3 && got.head == 5L && !got.contains(3L), got.toString)
  }
}
