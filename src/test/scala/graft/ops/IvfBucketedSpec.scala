package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The IVF deployment shape: corpus written bucketed by inverted list, so
  * the nprobe filter prunes PARTITIONS (unprobed lists never reach the
  * scan) while returning exactly the filter-over-scan path's results.
  */
class IvfBucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("bucketed table: partition-pruned probe == ivfTopK, plan shows PartitionFilters") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(emb, nlist = 16)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfb_").toString
    Similarity.ivfWriteBucketed(emb, cents, path)

    val bucketed = Similarity.ivfTopKBucketed(spark, path, cents, queryId = 0L, k = 10)
    val direct = Similarity.ivfTopK(emb, queryId = 0L, k = 10, nlist = 16, nprobe = 4)
    val a = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b && a.size == 10)

    // the serving form — query vector supplied by the caller, so the ONLY
    // scan is the pruned probe — returns identical rows
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toArray
    val viaVec = Similarity.ivfTopKBucketedVec(spark, path, cents, q,
      excludeId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaVec == a)

    // the probe must reach the scan as a partition filter (directory-level
    // pruning), not a post-scan filter over all lists
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cid"),
      s"probe did not prune partitions:\n$plan")
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cid"), s"cid not in partition filters: $pf")
  }
}
