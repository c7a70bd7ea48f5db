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

  test("bucketed window == unbucketed semantics, incl. boundary-straddling pairs") {
    // a bot spanning many day-buckets, with sessions crossing midnight:
    // the de-skewed (user, day)-bucketed window must produce EXACTLY the
    // consecutive-pair set of the naive user-wide window
    val day = 86400L
    val botLog = (0 until 6).flatMap { d =>
      Seq(
        ("bot", d * day + 100L, s"q${d}a"),
        ("bot", d * day + 200L, s"q${d}b"),
        // last event of day d, 30s before midnight...
        ("bot", (d + 1) * day - 30L, s"q${d}c")
      )
    } ++ Seq(
      // ...pairs with the first event of day d+1 (30+100 <= 600 gap)
      ("u9", 50L, "x"), ("u9", 100L, "y")
    )
    val df = botLog.toDF("user", "ts", "query")
    val (_, got) = Suggest.learn(df, sessionGapSec = 600L)
    // naive reference: sort each user's rows, pair consecutive within gap
    val expected = botLog.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(_._2).sliding(2).collect {
        case Seq((_, t1, q1), (_, t2, q2))
          if t2 - t1 <= 600L && q1 != q2 => (q1, q2)
      }
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    val gotSet = got.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(gotSet == expected, s"got $gotSet\nexpected $expected")
    // midnight-straddling pairs really exist in the expectation (q0c→q1a …)
    assert(expected.exists(_._1 == "q0c"), "test must exercise boundary pairs")
    // the skew guard is in the plan: the window partitions by (user, __b),
    // never by user alone
    val plan = Suggest.learn(df, 600L)._2.queryExecution.sparkPlan.toString
    assert(plan.contains("__b"), s"window not bucketed:\n$plan")
  }

  test("single-day bot spreads over sub-day buckets with exact pairs") {
    // one bot, ALL events inside one day: the hour-bucketed window must
    // bound each partition at the per-hour volume (not the whole day)
    // while still producing the naive pair multiset exactly
    val botLog = (0 until 24).flatMap { h =>
      (0 until 50).map(i => ("bot", h * 3600L + i * 70L, s"q${(h * 50 + i) % 7}"))
    }
    val df = botLog.toDF("user", "ts", "query")
    val (_, got) = Suggest.learn(df, sessionGapSec = 600L)
    val expected = botLog.sortBy(_._2).sliding(2).collect {
      case Seq((_, t1, q1), (_, t2, q2))
        if t2 - t1 <= 600L && q1 != q2 => (q1, q2)
    }.toSeq.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    val gotSet = got.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(gotSet == expected)
    // partition width is the hour's volume: 24 buckets of 50, never 1200
    val widths = df.withColumn("__b", org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.col("ts") / 3600L))
      .groupBy("user", "__b").count().collect().map(_.getLong(2))
    assert(widths.length == 24 && widths.forall(_ == 50L))
  }
}
