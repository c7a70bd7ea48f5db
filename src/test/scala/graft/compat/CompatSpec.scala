package graft.compat

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Rank-identity against the reference's own grntest select fixtures
  * (reference test/command/suite/select/...): each fixture's DDL + load
  * runs through our engine, and every select's hit set, values, and
  * scores must equal the `.expected` envelope.
  */
class CompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val suite = "/root/reference/test/command/suite"

  /** Curated fixtures our supported command subset covers. */
  private val fixtures = Seq(
    "select/query/match/prefer_full_text_searchable_index",
    "select/query/match/no_index",
    "select/query/near_search/middle",
    "select/query/near_search/default_max_interval/match",
    "select/query/near_search/default_max_interval/not_match",
    "select/query/near_search/custom_max_interval/match",
    "select/query/near_search/custom_max_interval/not_match",
    "select/filter/logical_operation/and_not",
    "select/filter/logical_operation/not",
    "select/filter/compare_operation/less/int32"
  )

  fixtures.foreach { fx =>
    test(s"grntest: $fx") {
      val outcomes = GrnTestRunner.run(spark, s"$suite/$fx.test", s"$suite/$fx.expected")
      assert(outcomes.nonEmpty, "fixture had no select commands")
      outcomes.foreach { o => assert(o.ok, s"${o.query}: ${o.detail}") }
    }
  }
}
