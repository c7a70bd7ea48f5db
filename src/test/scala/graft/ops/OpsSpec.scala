package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "g1"),
    (1L, "the quick brown fox jumps over the lazy cat", "g1"), // near-dup of 0
    (2L, "completely different words about spark engines here", "g1"),
    (3L, "the quick brown fox jumps over the lazy dog", "g2"), // exact dup of 0
    (4L, "der hund und die katze und das haus und der garten", "g2")
  ).toDF("doc_id", "text", "source")

  test("exact dedup stats and groups") {
    val st = Dedup.exactStats(docs).collect()(0)
    assert(st.getLong(0) == 5 && st.getLong(1) == 4)
    // groups only count same-text rows; doc 0 and 3 share a digest
    val g = Dedup.exactGroups(docs).collect()
    assert(g.length == 1 && g(0).getLong(1) == 2 && g(0).getLong(2) == 0L)
  }

  test("minhash LSH finds near-dup pair, not unrelated pair") {
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(Dedup.minhashSignatures(docs, shingleK = 2), bands = 16))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // identical text always collides
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near-dup
    assert(!pairs.contains((2L, 4L))) // disjoint docs
  }

  test("simhash: identical texts equal, near-dups close, disjoint far") {
    val fp = Dedup.simhash(docs)
    val sh = fp.select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(0L) == sh(3L))
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(4L)))
    // packed value consistent with the unsigned halves
    val parts = fp.select("doc_id", "sh_lo", "sh_hi").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(sh(0L) == ((parts(0L)._2 << 32) | parts(0L)._1))
  }

  test("simhash hamming-bucket pairs find the exact dup, not disjoint docs") {
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs), maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // identical → hamming 0
    assert(!pairs.contains((2L, 4L)))
  }

  test("ngram jaccard pairs: exact dup = 1000, near-dup high, cross-group excluded") {
    val j = Dedup.ngramJaccardPairs(docs, "source")
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(!j.contains((0L, 3L))) // different groups never pair
    assert(j((0L, 1L)) >= 500)    // 7-gram overlap of 9-word near-dups
  }

  test("pair-restricted near-dup pipeline: LSH candidates verified exactly") {
    val nd = Dedup.nearDupPairs(docs)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(nd((0L, 3L)) == 1000L) // exact dup
    assert(nd.get((0L, 1L)).forall(_ >= 500)) // near-dup, if LSH caught it
    assert(!nd.contains((2L, 4L))) // disjoint docs never collide
  }

  test("brute-force cosine top-k is exact and ordered") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(emb, 0L, 2).as[(Long, Long)].collect()
    assert(top.map(_._1).toSeq == Seq(1L, 2L))
    assert(top(0)._2 > 990) // cos ~0.994
  }

  test("LSH ANN recall: bucket of query holds its true nearest neighbor") {
    // clustered vectors: two tight clusters far apart
    val emb = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f, 0.0f) else Array(0.0f, 1.0f, 0.0f, 0.0f)
      val eps = 0.01f * (i / 2)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + (if (d == 2) eps else 0f) })
    }.toDF("vec_id", "embedding")
    val ann = Similarity.lshTopK(emb, 0L, 5).as[(Long, Long)].collect()
    val exact = Similarity.cosineTopK(emb, 0L, 5).as[(Long, Long)].collect()
    // same-cluster ids are even; ANN must return only same-cluster ids
    assert(ann.nonEmpty && ann.forall(_._1 % 2 == 0))
    // recall@5 >= 3/5 for this easy separation
    assert(ann.map(_._1).toSet.intersect(exact.map(_._1).toSet).size >= 3)
  }

  test("IVF ANN: probed lists find the cluster; Lloyd refine keeps/improves recall") {
    // two tight clusters far apart (same fixture shape as the LSH test)
    val emb = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f, 0.0f) else Array(0.0f, 1.0f, 0.0f, 0.0f)
      val eps = 0.01f * (i / 2)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + (if (d == 2) eps else 0f) })
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(emb, nlist = 4)
    assert(cents.length == 4 && cents.map(_._1).toSeq == Seq(0, 1, 2, 3))
    // every vector lands in some list; list of query holds same-cluster ids
    val asn = Similarity.ivfAssign(emb, cents).as[(Long, Int, Long)].collect()
    assert(asn.length == 40 && asn.forall(_._2 >= 0))
    val ann = Similarity.ivfTopK(emb, 0L, 5, nlist = 4, nprobe = 1).as[(Long, Long)].collect()
    assert(ann.nonEmpty && ann.forall(_._1 % 2 == 0)) // only same-cluster ids
    // nprobe=2 covers the cluster even when seeded centroids split it
    val ann2 = Similarity.ivfTopK(emb, 0L, 5, nlist = 4, nprobe = 2).as[(Long, Long)].collect()
    val exact = Similarity.cosineTopK(emb, 0L, 5).as[(Long, Long)].collect()
    assert(ann2.map(_._1).toSet.intersect(exact.map(_._1).toSet).size >= 3)
    // spherical k-means refinement: unit centroids, and the Lloyd objective
    // (mean cosine to the assigned centroid) is monotone non-decreasing
    val refined = Similarity.ivfRefine(emb, cents, iters = 2)
    assert(refined.length == 4 && refined.forall { case (_, v) =>
      math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9 })
    def objective(cs: Array[(Int, Array[Double])]): Double =
      Similarity.ivfAssign(emb, cs).agg(avg("sim_q6")).as[Double].collect()(0)
    assert(objective(refined) >= objective(cents) - 1.0) // 1e-6 quantization slack
    // refined ANN still returns only same-cluster ids
    val annR = Similarity.ivfTopK(emb, 0L, 5, nlist = 4, nprobe = 1, iters = 2)
      .as[(Long, Long)].collect()
    assert(annR.nonEmpty && annR.forall(_._1 % 2 == 0))
  }

  test("punct ratio and rolling fingerprint compute exactly") {
    val d = Seq((0L, "hello, world! x2"), (1L, "clean words only")).toDF("doc_id", "text")
    val q = TextAnalysis.quality(d).collect().map(r => r.getLong(0) -> r).toMap
    // "hello, world! x2": 16 chars, 2 punct (, and !) -> 2*1000 div 16 = 125
    assert(q(0L).getAs[Long]("punct_ratio_q3") == 125L)
    assert(q(1L).getAs[Long]("punct_ratio_q3") == 0L)
    val fp = TextAnalysis.rollingFingerprint(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-rolled Karp-Rabin must agree
    def kr(s: String): Long = s.foldLeft(0L)((h, c) => (h * 257 + c.toLong) % 2147483647L)
    assert(fp(0L) == kr("hello, world! x2") && fp(1L) == kr("clean words only"))
    assert(fp(0L) != fp(1L))
  }

  test("n-gram language ID discriminates en/de/es sentences") {
    val samples = Seq(
      (0L, "this is about what would have been there from the start"),
      (1L, "der hund ist nicht mit der katze durch den garten gelaufen"),
      (2L, "este texto habla sobre los perros y las casas para una familia")
    ).toDF("doc_id", "text")
    val preds = TextAnalysis.langIdNgram(samples).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(0L -> "en", 1L -> "de", 2L -> "es"))
  }

  test("dedupCorpus keeps one survivor per near-dup cluster") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 0
      (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 0
      (3L, "completely different text about distributed query engines and parquet files"),
      (4L, "der hund springt ueber den zaun und laeuft durch den garten nach hause")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(corpus, thresholdQ3 = 700, shingleK = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L) && kept.contains(3L) && kept.contains(4L))
    assert(!kept.contains(2L)) // exact dup collapsed into 0
    assert(!kept.contains(1L)) // near-dup collapsed into 0
  }

  test("dedup clusters: min-label connected components + singletons") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val all = (1L to 7L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val got = Dedup.dedupClusters(pairs, Some(all))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    // a 4-hop chain needs several propagation rounds
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("a", "b")
    val gotChain = Dedup.dedupClusters(chain).as[(Long, Long)].collect().toMap
    assert(gotChain.values.toSet == Set(10L))
  }

  test("int8 quantization: values in range, reconstruction cosine ~1") {
    val emb = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(16)(d => ((i * 31 + d * 7) % 97 - 48) / 48.0f))
    }.toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(emb).collect()
    assert(q.length == 20)
    q.foreach { r =>
      val qv = r.getSeq[Int](2)
      assert(qv.forall(v => v >= -127 && v <= 127))
      assert(qv.exists(v => math.abs(v) == 127)) // max element hits full range
    }
    val row = Similarity.quantizeInt8Quality(emb).collect()(0)
    assert(row.getLong(0) == 20)
    assert(row.getLong(1) > 990000, s"min cos_q6 ${row.getLong(1)}") // > 0.99
  }

  test("text analysis: quality, token counts, langid, fingerprint") {
    val q = TextAnalysis.quality(docs).filter($"doc_id" === 0L).collect()(0)
    assert(q.getLong(1) == 9) // n_words
    assert(q.getLong(4) == 222) // 'the' twice / 9 words = 222 (x1000 floor)
    val tc = TextAnalysis.tokenCounts(docs).filter($"doc_id" === 0L).collect()(0)
    assert(tc.getLong(1) == 9 && tc.getLong(2) == 9)
    val li2 = TextAnalysis.langId(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(li2(0L) == "en" && li2(4L) == "de")
    val fp = TextAnalysis.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(3L) && fp(0L) != fp(1L) && fp(0L).length == 16)
  }

  test("capped surprisal: OOV bucket carries residual mass, exact by hand") {
    // vocab a:3 b:1 c:1, total 5; cap at 1 -> LM {a}, residual 2
    // s(a) = floor(-ln(3/5)*1000) = 510, s(oov) = floor(-ln(2/5)*1000) = 916
    // doc: 3*510 + 2*916 = 3362; 3362 div 5 = 672
    val tiny = Seq((0L, "a a a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramSurprisal(tiny, maxVocab = 1).collect()(0)
    assert(r.getLong(1) == 5 && r.getLong(2) == 672)
  }

  test("surprisal: full-vocab cap is a no-op; shuffle LM path row-identical") {
    val full = TextAnalysis.unigramSurprisal(docs).orderBy("doc_id").collect().toSeq
    val big = TextAnalysis.unigramSurprisal(docs, maxVocab = 1 << 20)
      .orderBy("doc_id").collect().toSeq
    assert(full == big)
    for (mv <- Seq(3, 1 << 20)) {
      val b = TextAnalysis.unigramSurprisal(docs, maxVocab = mv)
        .orderBy("doc_id").collect().toSeq
      val s = TextAnalysis.unigramSurprisal(docs, maxVocab = mv, broadcastLm = false)
        .orderBy("doc_id").collect().toSeq
      assert(b == s, s"broadcast vs shuffle LM mismatch at maxVocab=$mv")
    }
  }
}
