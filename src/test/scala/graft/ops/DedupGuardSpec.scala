package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale guards on the dedup pipeline: star-algorithm connected components
  * (O(log n) rounds vs the propagate baseline's O(diameter)), the LSH
  * bucket-size cap with its non-silent overflow metric, and dedupCorpus's
  * exact-dedup pre-pass that keeps LSH work proportional to distinct
  * contents even when the corpus carries a giant exact-dup cluster.
  */
class DedupGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustersOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet

  test("star CC == propagate CC on cliques, chains, forests, singletons") {
    // two cliques, one chain, one isolated doc (via the docs node list)
    val pairs = Seq(
      // clique {1,2,3}
      (1L, 2L), (2L, 3L), (1L, 3L),
      // chain 10-11-12-13
      (10L, 11L), (11L, 12L), (12L, 13L),
      // cross edge merging {20,21} with {22,23}
      (20L, 21L), (22L, 23L), (21L, 22L)
    ).toDF("a", "b")
    val docs = (Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 20L, 21L, 22L, 23L) :+ 99L)
      .toDF("doc_id")
    val star = clustersOf(Dedup.dedupClusters(pairs, Some(docs)))
    val prop = clustersOf(Dedup.dedupClustersPropagate(pairs, Some(docs)))
    assert(star == prop)
    assert(star.contains((99L, 99L)) && star.contains((13L, 10L)) &&
      star.contains((23L, 20L)))
  }

  test("star CC converges in O(log n) rounds on a long chain") {
    val n = 256
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val (out, rounds) = Dedup.dedupClustersStars(chain)
    val labels = out.as[(Long, Long)].collect()
    assert(labels.length == n && labels.forall(_._2 == 0L))
    // propagate needs ~n rounds on this graph; the star algorithm is
    // logarithmic (observed 4-6 at n=256) — pin a generous log-scale bound
    assert(rounds <= 12, s"expected O(log n) rounds, got $rounds")
  }

  test("superseded star rounds free their checkpoint blocks (no RDD pile-up)") {
    // Dataset.unpersist does NOT drop a localCheckpoint's RDD blocks, so
    // without RDD-level tracking each round's full edge set would stay
    // pinned in MEMORY_AND_DISK for the whole clustering run
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val n = 256
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val (out, rounds) = Dedup.dedupClustersStars(chain)
    out.collect(): Unit
    val leftover = (sc.getPersistentRDDs.keySet -- before).size
    assert(rounds >= 3, s"test needs multiple rounds to be meaningful: $rounds")
    // only the FINAL round's checkpoint may remain (the returned DataFrame
    // reads from it); every superseded round must have been dropped
    assert(leftover <= 1,
      s"$leftover persisted RDDs left after $rounds rounds — superseded checkpoints leaked")
  }

  test("bucket cap star-links oversized buckets, all-pairs the rest") {
    // band rows: bucket 100 holds 5 docs (star-linked at cap 4), bucket 200
    // holds 2 (all-paired), bucket 300 is a singleton (unpairable)
    val rows = (0L until 5L).map(d => (d, 0, 100L)) ++
      Seq((10L, 0, 200L), (11L, 0, 200L), (12L, 1, 300L))
    val bandRows = rows.toDF("doc_id", "band", "bucket")
    val over = Dedup.lshOverflowBuckets(bandRows, 4L).as[(Int, Long, Long)].collect()
    assert(over.toSeq == Seq((0, 100L, 5L)))
    // the big bucket degrades to O(m) member↔min-id pairs — still CONNECTED
    // (one cluster through doc 0), never m²/2
    val capped = Dedup.lshCandidatePairs(bandRows, maxBucketSize = 4L)
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((10L, 11L), (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    // uncapped join still sees every pair of the big bucket
    val full = Dedup.lshCandidatePairs(bandRows, maxBucketSize = Long.MaxValue)
    assert(full.count() == 10 + 1)
  }

  test("property: capped candidate graph keeps the uncapped connected components") {
    // the guarantee star-linking rests on: whatever the bucket distribution,
    // replacing an over-cap bucket's clique with its star changes EDGES but
    // never CONNECTIVITY — clustering downstream of the candidates is
    // invariant under the cap (only pairwise Jaccard verification sees the
    // difference, the documented recall margin)
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val rows = Seq.fill(150)(
        (rnd.nextInt(60).toLong, rnd.nextInt(2), rnd.nextInt(6).toLong)).distinct
      val bandRows = rows.toDF("doc_id", "band", "bucket")
      def comps(p: org.apache.spark.sql.DataFrame) =
        Dedup.dedupClusters(p).as[(Long, Long)].collect().toSet
      val capped = comps(Dedup.lshCandidatePairs(bandRows, maxBucketSize = 4L))
      val full = comps(Dedup.lshCandidatePairs(bandRows, maxBucketSize = Long.MaxValue))
      assert(capped == full, s"trial $trial: cap changed connectivity")
    }
  }

  test("star-linked overflow bucket still collapses to one cluster") {
    // a near-identical (NOT byte-identical) boilerplate cluster: exact
    // dedup can't collapse it, the bucket blows the cap — the star edges
    // must keep every member reachable from the representative
    val m = 30L
    val bandRows = (0L until m).map(d => (d, 0, 7L)).toDF("doc_id", "band", "bucket")
    val pairs = Dedup.lshCandidatePairs(bandRows, maxBucketSize = 8L)
    assert(pairs.count() == m - 1) // O(m), not m(m-1)/2
    val clusters = Dedup.dedupClusters(pairs)
      .select("cluster_id").distinct().as[Long].collect().toSeq
    assert(clusters == Seq(0L))
  }

  test("dedupCorpus collapses a planted exact-dup megacluster; LSH work stays ∝ representatives") {
    def text(i: Int): String =
      s"unique document ${('a' + i % 23).toChar} body with number $i tokens " +
        s"and shared tail ${i % 5} of words"
    val uniques = (0 until 40).map(i => (i.toLong, text(i)))
    // 400 exact copies of doc 7's text, ids far above the original
    val planted = uniques ++ (0 until 400).map(j => (1000L + j, text(7)))
    val plantedDf = planted.toDF("doc_id", "text")
    val uniquesDf = uniques.toDF("doc_id", "text")

    // survivors are unchanged by the megacluster: every copy joins doc 7's
    // cluster and 7 stays its minimum
    val got = Dedup.dedupCorpus(plantedDf).select("doc_id")
      .as[Long].collect().toSet
    val want = Dedup.dedupCorpus(uniquesDf).select("doc_id")
      .as[Long].collect().toSet
    assert(got == want)
    assert(got.contains(7L) && !got.exists(_ >= 1000L))

    // the raw corpus has 16 overflowing buckets (one per band, all holding
    // the 401 identical signatures); the representative set has none — the
    // pre-pass is what keeps candidate work ∝ distinct contents
    val rawOver = Dedup.lshOverflowBuckets(
      Dedup.minhashBands(plantedDf), maxBucketSize = 100L)
    assert(rawOver.count() == 16)
    val reps = plantedDf.withColumn("digest", md5(col("text")))
      .groupBy("digest").agg(min("doc_id").as("doc_id"))
      .join(plantedDf, "doc_id").select("doc_id", "text")
    val repOver = Dedup.lshOverflowBuckets(
      Dedup.minhashBands(reps), maxBucketSize = 100L)
    assert(repOver.isEmpty)
  }
}
