package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class GrnStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("DataFrame -> dump text -> DataFrames round-trips exactly") {
    val df = Seq(
      ("alice", 30, 1.5, true, Seq("a", "b")),
      ("bob \"q\" \\x", -7, 2.0, false, Seq.empty[String]),
      ("日本語", 0, -0.25, true, Seq("たぐ"))
    ).toDF("_key", "age", "score", "ok", "tags")

    val text = GrnStream.dumpText("Users", df, keyCol = Some("_key"))
    assert(text.startsWith("table_create Users TABLE_HASH_KEY ShortText"))
    assert(text.contains("column_create Users age COLUMN_SCALAR Int32"))
    assert(text.contains("column_create Users tags COLUMN_VECTOR ShortText"))
    assert(text.contains("load --table Users"))
    assert(text.contains("\"bob \\\"q\\\" \\\\x\"")) // JSON escaping

    val back = GrnStream.parseCommands(spark, text)("Users")
    assert(back.schema.fieldNames.toSeq == Seq("_key", "age", "score", "ok", "tags"))
    val a = df.collect().map(_.toSeq.map {
      case s: scala.collection.Seq[_] => s.toList; case v => v }).toSet
    val b = back.collect().map(_.toSeq.map {
      case s: scala.collection.Seq[_] => s.toList; case v => v }).toSet
    assert(a == b)
  }

  test("no-key table round-trips") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("n", "s")
    val text = GrnStream.dumpText("Logs", df)
    assert(text.startsWith("table_create Logs TABLE_NO_KEY"))
    val back = GrnStream.parseCommands(spark, text)("Logs")
    assert(back.schema.fieldNames.toSeq == Seq("n", "s"))
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("dump(Writer) streams the same bytes dumpText returns") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("n", "s")
    val sw = new java.io.StringWriter()
    GrnStream.dump("Logs", df, sw)
    assert(sw.toString == GrnStream.dumpText("Logs", df))
  }

  test("non-finite doubles dump as null (valid JSON), and parse back as null") {
    val df = Seq((1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity))
      .toDF("n", "v")
    val text = GrnStream.dumpText("Vals", df)
    assert(!text.contains("NaN") && !text.contains("Infinity"))
    val back = GrnStream.parseCommands(spark, text)("Vals")
    val byN = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byN(1L).getDouble(1) == 1.5)
    assert(byN(2L).isNullAt(1) && byN(3L).isNullAt(1))
  }

  test("parses the reference's own dump output (fixture)") {
    // the dump-output section of
    // test/command/suite/dump/record/vector_long_key.expected
    val raw = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/test/command/suite/dump/record/vector_long_key.expected"))
    val dumpOut = raw.substring(raw.indexOf("\ndump\n") + "\ndump\n".length)
    val tables = GrnStream.parseCommands(spark, dumpOut)
    assert(tables.keySet == Set("Tags", "Users"))
    val users = tables("Users").collect()
    assert(users.length == 1)
    assert(users(0).getString(0) == "alice")
    assert(users(0).getSeq[String](1) == Seq("long (larger than 24byte)"))
    // the Tags reference column resolved through Tags' key type
    assert(tables("Users").schema("tags").dataType == ArrayType(StringType))
    // object-form load rows (the fixture's pre-dump section) parse too
    val pre = raw.substring(0, raw.indexOf("\ndump\n"))
      .linesIterator.filterNot(l => l.startsWith("[[")).mkString("\n")
    val preTables = GrnStream.parseCommands(spark, pre)
    assert(preTables("Users").collect()(0).getString(0) == "alice")
  }

  test("end to end: command stream -> DataFrame -> index -> BM25") {
    // a Groonga-format corpus ingested via the command stream, indexed, and
    // queried — the full interop path a reference user would migrate along
    val corpus = (0 until 50).map { i =>
      val text = graft.core.Corpus.file(3L, i.toLong).content.take(300)
        .replace('\n', ' ')
      (s"doc$i", text)
    }.toDF("_key", "content")
    val text = GrnStream.dumpText("Docs", corpus, keyCol = Some("_key"))
    val parsed = GrnStream.parseCommands(spark, text)("Docs")
    import org.apache.spark.sql.functions._
    val docs = parsed.select(
      expr("CAST(substring(_key, 4) AS BIGINT)").as("docId"),
      col("content"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_grnstream_").toString
    graft.index.IndexBuilder.build(spark, docs, tmp,
      graft.index.IndexConfig(tokenizerName = "TokenBigram", nShards = 4,
        buildPartitions = 4, hotTermDf = 1000000L, nSalts = 1))
    val r = new graft.index.IndexReader(spark, tmp)
    assert(r.manifest.numDocs == 50)
    assert(graft.search.Engine.bm25TopK(r, "if", 5).collect().nonEmpty)
  }

  test("re-dumping a parsed reference dump reproduces the stream") {
    val raw = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/test/command/suite/dump/record/vector_long_key.expected"))
    val dumpOut = raw.substring(raw.indexOf("\ndump\n") + "\ndump\n".length)
    val users = GrnStream.parseCommands(spark, dumpOut)("Users")
    val redump = GrnStream.dumpText("Users", users, keyCol = Some("_key"))
    val expected = dumpOut.split("\n\n").filter(_.startsWith("load --table Users"))(0)
    assert(redump.contains(expected.trim))
  }
}
