package graft.command

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SuggestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val log = Seq(
    ("u1", 10L, "spark sql"), ("u1", 20L, "spark shell"), ("u1", 30L, "spark sql"),
    ("u2", 10L, "spark sql"), ("u2", 15L, "spark shell"),
    ("u2", 5000L, "groonga"), // outside session gap from previous
    ("u3", 1L, "sparc"), ("u3", 2L, "spark sql")
  ).toDF("user", "ts", "query")

  private lazy val (items, pairs) = Suggest.learn(log, sessionGapSec = 600L)

  test("complete: prefix ranked by frequency") {
    val r = Suggest.complete(items, "spark").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(r.toSeq == Seq(("spark sql", 4L), ("spark shell", 2L)))
  }

  test("correct: edit-distance neighbors exclude the query itself") {
    val r = Suggest.correct(items, "sparc sql", maxDistance = 2).collect().map(_.getString(0))
    assert(r.toSeq == Seq("spark sql"))
  }

  test("suggest: co-occurrence within session windows only") {
    val r = Suggest.suggest(pairs, "spark sql").collect().map(r => (r.getString(0), r.getLong(1)))
    // u1 and u2 both followed "spark sql" with "spark shell"; u2's
    // "groonga" is outside the 600s gap and must not appear
    assert(r.toSeq == Seq(("spark shell", 2L)))
  }
}
