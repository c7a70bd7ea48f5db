package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for the
  * 100 TB shape of the problem:
  *
  *   - exact: hash-groupBy on a content digest — one shuffle keyed by digest,
  *     map-side partial aggregation, no skew (digests are uniform).
  *   - MinHash + LSH: per-doc signature (narrow map) → band buckets → shuffle
  *     keyed by (band, bucketHash) → candidate pairs only within buckets —
  *     the classic near-linear near-dup join; the O(n²) verify runs only on
  *     bucket collisions.
  *   - SimHash: 64-bit fingerprint per doc (narrow map); near-dups = small
  *     hamming distance, bucketed by 16-bit sub-bands.
  *   - n-gram Jaccard: exact verify for candidate pairs via shingle
  *     explode + count joins (pure DataFrame ops — distributed, no driver
  *     loops).
  */
object Dedup {

  /** Exact-dup stats: one row (total, uniq). */
  def exactStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.agg(
      count(lit(1)).as("total"),
      countDistinct(md5(col(textCol))).as("uniq"))

  /** Exact-dup groups: digest → count (only groups with >1 member). */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
      .filter(col("n") > 1)

  // ---- MinHash --------------------------------------------------------

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 64-bit hash of a string (FNV-1a over UTF-8, then finalized). */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    splitmix64(h)
  }

  /** Word-level shingles of size `k` (distinct set). */
  def shingleSet(ws: Array[String], k: Int): Array[Long] = {
    if (ws.length < k) {
      if (ws.isEmpty) Array.empty else Array(hash64(ws.mkString(" ")))
    } else {
      val out = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i + k <= ws.length) {
        val sb = new StringBuilder
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(ws(i + j)); j += 1 }
        out.add(hash64(sb.toString)); i += 1
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator()
      var p = 0
      while (it.hasNext) { arr(p) = it.next(); p += 1 }
      arr
    }
  }

  /** MinHash signature: for permutation p, min over shingles of
    * splitmix64(shingleHash ^ seed_p). Deterministic in (seed, numPerm).
    */
  def minhashSig(shingles: Array[Long], numPerm: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = shingles(i)
      var p = 0
      while (p < numPerm) {
        val v = splitmix64(h ^ splitmix64(seed + p))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** Per-doc MinHash signatures: (doc_id, sig: Array[Long]). */
  def minhashSignatures(
      docs: DataFrame,
      textCol: String = "text",
      numPerm: Int = 64,
      shingleK: Int = 3,
      seed: Long = 42L
  ): DataFrame = {
    val sigUdf = udf { (text: String) =>
      minhashSig(shingleSet(text.split(' '), shingleK), numPerm, seed)
    }
    docs.select(col("doc_id"), sigUdf(col(textCol)).as("sig"))
  }

  /** LSH band rows: signature split into `bands` bands of numPerm/bands rows
    * each; bucket key = hash of the band slice. Docs sharing any (band,
    * bucket) are near-dup candidates.
    */
  def lshBands(sigs: DataFrame, bands: Int): DataFrame = {
    val bandUdf = udf { (sig: Seq[Long]) =>
      val rows = sig.length / bands
      (0 until bands).map { b =>
        var h = 0xcbf29ce484222325L
        var i = b * rows
        while (i < (b + 1) * rows) { h = splitmix64(h ^ sig(i)); i += 1 }
        (b, h)
      }
    }
    sigs.select(col("doc_id"), explode(bandUdf(col("sig"))).as("bb"))
      .select(col("doc_id"), col("bb._1").as("band"), col("bb._2").as("bucket"))
  }

  /** Candidate near-dup pairs from LSH buckets (a < b, distinct). The
    * self-join is keyed by (band, bucket) — only colliding docs meet.
    */
  def lshCandidatePairs(bandRows: DataFrame): DataFrame = {
    val l = bandRows.select(col("band"), col("bucket"), col("doc_id").as("a"))
    val r = bandRows.select(col("band"), col("bucket"), col("doc_id").as("b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** SimHash-64 fingerprint per doc over word shingles. */
  def simhash(docs: DataFrame, textCol: String = "text", shingleK: Int = 2): DataFrame = {
    val shUdf = udf { (text: String) =>
      val sh = shingleSet(text.split(' '), shingleK)
      val acc = new Array[Int](64)
      var i = 0
      while (i < sh.length) {
        val h = sh(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    docs.select(col("doc_id"), shUdf(col(textCol)).as("simhash"))
  }

  /** Exact word-k-gram Jaccard for all pairs within a grouping column —
    * pure DataFrame ops: explode distinct shingles, self-join on shingle
    * within the group (the shuffle key), count intersections, join sizes.
    * Emits integer fixed-point jaccard (x1000, floor). Use after LSH at
    * scale; the grouping column bounds the pair blow-up.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      groupCol: String,
      textCol: String = "text",
      k: Int = 3
  ): DataFrame = {
    val grams = docs
      .filter(size(split(col(textCol), " ")) >= k)
      .select(col("doc_id"), col(groupCol).as("grp"),
        expr(s"transform(sequence(0, size(split($textCol, ' ')) - $k), " +
          s"i -> array_join(slice(split($textCol, ' '), i + 1, $k), ' '))")
          .as("gs"))
      .select(col("doc_id"), col("grp"), explode(array_distinct(col("gs"))).as("g"))
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = grams.as("x")
      .join(grams.as("y"), expr("x.grp = y.grp AND x.g = y.g AND x.doc_id < y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sb"), "b")
      .select(col("a"), col("b"),
        expr("inter * 1000 div (sa + sb - inter)").as("jaccard_q3"))
  }
}
