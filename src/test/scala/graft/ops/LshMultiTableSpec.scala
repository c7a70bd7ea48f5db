package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-table sign-LSH ANN: table 0 reproduces the single-table path
  * exactly, and OR-amplification can only widen the candidate set — recall
  * against the exact top-k is monotone in the table count.
  */
class LshMultiTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("tables = 1 reduces exactly to lshTopK") {
    val single = ids(Similarity.lshTopK(emb, 0L, 10, planes = 4, probeDist = 1))
    val multi = ids(Similarity.lshTopKMulti(emb, 0L, 10, planes = 4,
      probeDist = 1, tables = 1))
    assert(multi == single && multi.size == 10)
  }

  test("more tables widen the candidate union and never lose recall") {
    val exact = Similarity.cosineTopK(emb, 0L, 10).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    def recall(tables: Int): Int =
      ids(Similarity.lshTopKMulti(emb, 0L, 10, planes = 8, probeDist = 0,
        tables = tables)).map(_._1).count(exact)
    // recall vs exact top-k is monotone in tables: table 0 is shared, and a
    // candidate can only displace an exact-top-k member if it is itself an
    // exact-top-k member
    assert(recall(4) >= recall(1))
    // the union genuinely widens: probed candidates strictly grow from one
    // 8-plane bucket (~N/256 docs) to four independent ones
    def candidates(tables: Int): Long = {
      val b = Similarity.lshBucketsMulti(emb, planes = 8, tables = tables)
      val qRows = b.filter(col("vec_id") === 0L).select("t", "bucket").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toMap
      b.filter(col("vec_id") =!= 0L)
        .filter(qRows.map { case (t, bk) => col("t") === t && col("bucket") === bk }
          .reduce(_ || _))
        .select("vec_id").distinct().count()
    }
    val c1 = candidates(1)
    val c4 = candidates(4)
    assert(c4 > c1, s"4-table union should widen candidates: c1=$c1 c4=$c4")
  }
}
