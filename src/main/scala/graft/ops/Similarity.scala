package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a single narrow map over the scan
  * (the query vector is a broadcast literal folded into the plan) followed by
  * TakeOrderedAndProject; at 100 TB this is one pass, no shuffle.
  *
  * Scale path: sign-random-projection LSH with deterministic ±1 (Rademacher)
  * hyperplane components derived from md5 — per-row bucket signature is a
  * narrow codegen'd projection (the sign matrix folds into the plan as
  * array literals; no UDF, no broadcast variable), candidate search then
  * brute-forces only within the probed buckets. Multi-probe (hamming ≤ 1
  * neighbors of the query bucket) trades a constant factor for recall.
  *
  * Everything is reproducible by any engine with md5 + double arithmetic:
  * the DuckDB oracles replicate bucket assignment bit-for-bit (dot products
  * quantized at 1e-6 before the sign test so accumulation-order noise at
  * 1e-16 cannot flip a bucket bit).
  *
  * Dot products use `zip_with`/`aggregate` higher-order functions in double
  * precision — codegen'd, no UDF in the hot path.
  */
object Similarity {

  /** exact cosine(embCol, literal query vector) as a codegen'd column. */
  def cosineToQuery(embCol: String, q: Array[Double]): Column = {
    val qlit = q.mkString("array(", "D, ", "D)")
    val dot = s"aggregate(zip_with($embCol, $qlit, (x, y) -> cast(x as double) * y), 0D, (a, x) -> a + x)"
    val na = s"aggregate($embCol, 0D, (a, x) -> a + cast(x as double) * cast(x as double))"
    val nb = q.map(x => x * x).sum
    expr(s"$dot / (sqrt($na) * sqrt(${nb}D))")
  }

  /** Brute-force cosine top-k against the embedding of `queryId` (excluded
    * from results). Emits (vec_id, sim_q3) fixed-point, ordered.
    */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q: Array[Double] = emb.filter(col("vec_id") === queryId)
      .select("embedding").collect()(0)
      .getSeq[Float](0).map(_.toDouble).toArray
    emb.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        (round(cosineToQuery("embedding", q) * 1000)).cast("long").as("sim_q3"))
      .orderBy(desc("sim_q3"), asc("vec_id"))
      .limit(k)
  }

  /** All-pairs cosine >= threshold (embedding near-dup detection). The
    * broadcast self-join is quadratic — use only post-LSH or per-bucket.
    */
  def cosinePairsAbove(emb: DataFrame, threshold: Double): DataFrame = {
    val l = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val r = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val dot = expr("aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)), 0D, (a, x) -> a + x)")
    val na = expr("aggregate(ea, 0D, (a, x) -> a + cast(x as double) * cast(x as double))")
    val nb = expr("aggregate(eb, 0D, (a, x) -> a + cast(x as double) * cast(x as double))")
    l.join(r, col("a") < col("b"))
      .withColumn("sim", dot / (sqrt(na) * sqrt(nb)))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim") * 1000).cast("long").as("sim_q3"))
  }

  /** [[cosinePairsAbove]] with the threshold on the QUANTIZED sim_q3 — the
    * exact-recall baseline the LSH path is measured against (identical
    * boundary semantics on both sides, so recall is well defined).
    */
  def cosinePairsAboveQ3(emb: DataFrame, thresholdQ3: Long): DataFrame =
    cosinePairsAbove(emb, -2.0).filter(col("sim_q3") >= thresholdQ3)

  /** Table-t seed for multi-table LSH: table 0 keeps the single-table
    * bucket definition; further tables stride by an odd 64-bit constant
    * (golden-ratio mix) so their md5-derived sign matrices are independent.
    */
  def tableSeed(seed: Long, t: Int): Long = seed + 0x9E3779B97F4A7C15L * t

  /** Embedding near-dup pairs restricted to shared LSH buckets — the 100 TB
    * shape of [[cosinePairsAbove]]: the self-join is keyed by (table,
    * bucket), never all-pairs. `tables` is the OR-amplification dial: one
    * 8-plane table catches a cos≈0.9 pair with probability (1−θ/π)⁸ ≈ 0.43,
    * so the single-table setting silently loses more than half the true
    * pairs; with T independent tables the miss rate decays as (1−p)^T
    * (4 tables ⇒ ≈ 0.1 at cos 0.9, ≈ 10⁻⁶ at cos 0.999). Candidates from
    * all tables union + dedup BEFORE the cosine verify, so each surviving
    * pair is verified once. The threshold compares on the quantized sim_q3
    * so engines agree at the boundary.
    */
  def cosinePairsAboveLsh(emb: DataFrame, thresholdQ3: Long, planes: Int = 8,
      seed: Long = 42L, tables: Int = 1): DataFrame = {
    val b = lshBucketsMulti(emb, planes, seed, tables)
    val cand = b.select(col("t"), col("bucket"), col("vec_id").as("a"))
      .join(b.select(col("t"), col("bucket"), col("vec_id").as("b")), Seq("t", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val dot = expr("aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)), 0D, (a, x) -> a + x)")
    val na = expr("aggregate(ea, 0D, (a, x) -> a + cast(x as double) * cast(x as double))")
    val nb = expr("aggregate(eb, 0D, (a, x) -> a + cast(x as double) * cast(x as double))")
    cand
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .withColumn("sim_q3", round(dot / (sqrt(na) * sqrt(nb)) * 1000).cast("long"))
      .filter(col("sim_q3") >= thresholdQ3)
      .select("a", "b", "sim_q3")
  }

  /** Pair-level recall of the multi-table LSH near-dup path against the
    * exact all-pairs baseline at the same quantized threshold: one row
    * (n_exact, n_lsh, hits, recall_q3). The exact side is quadratic by
    * design — this is the measurement harness, not the production path.
    */
  def cosinePairsRecall(emb: DataFrame, thresholdQ3: Long, planes: Int = 8,
      seed: Long = 42L, tables: Int = 1): DataFrame = {
    val exact = cosinePairsAboveQ3(emb, thresholdQ3).select("a", "b")
    val lsh = cosinePairsAboveLsh(emb, thresholdQ3, planes, seed, tables).select("a", "b")
    exact.withColumn("__e", lit(1))
      .join(lsh.withColumn("__l", lit(1)), Seq("a", "b"), "full_outer")
      .agg(
        coalesce(sum("__e"), lit(0L)).cast("long").as("n_exact"),
        coalesce(sum("__l"), lit(0L)).cast("long").as("n_lsh"),
        coalesce(sum(col("__e") * col("__l")), lit(0L)).cast("long").as("hits"))
      .select(col("n_exact"), col("n_lsh"), col("hits"),
        expr("CASE WHEN n_exact = 0 THEN 1000 ELSE hits * 1000 div n_exact END").as("recall_q3"))
  }

  // ---- sign-random-projection LSH ---------------------------------------

  /** Deterministic ±1 sign matrix (planes × dims) from md5("hp:seed:p:d") —
    * reproducible by any engine with md5 (the DuckDB oracle embeds the same
    * literals). Rademacher components are standard for sign-projection LSH.
    */
  def signMatrix(dims: Int, planes: Int, seed: Long): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes) { p =>
      Array.tabulate(dims) { d =>
        val h = md.digest(s"hp:$seed:$p:$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1 else -1
      }
    }
  }

  /** Per-plane signed dot product SQL fragment (shared with the oracle
    * generator): Σ_d emb[d] · sign[d], quantized at 1e-6 for the sign test.
    */
  private def dotExpr(embCol: String, signs: Array[Int]): String = {
    val slit = signs.mkString("array(", "D, ", "D)")
    s"aggregate(zip_with($embCol, $slit, (x, y) -> cast(x as double) * y), 0D, (a, x) -> a + x)"
  }

  /** SQL text of the bucket id: bit p = sign of the p-th projection. */
  private def bucketSql(embCol: String, sm: Array[Array[Int]]): String =
    sm.zipWithIndex.map { case (row, p) =>
      s"shiftleft(IF(CAST(round(${dotExpr(embCol, row)} * 1000000) AS BIGINT) >= 0, 1, 0), $p)"
    }.mkString(" + ")

  /** Bucket id column: bit p = sign of the p-th projection. */
  def bucketExpr(embCol: String, sm: Array[Array[Int]]): Column =
    expr(bucketSql(embCol, sm))

  /** Sign-random-projection LSH bucket id per row — one narrow projection,
    * sign matrix folded into the plan as literals.
    */
  def lshBuckets(emb: DataFrame, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val sm = signMatrix(dims, planes, seed)
    emb.withColumn("bucket", bucketExpr("embedding", sm))
  }

  /** One (t, bucket) row per (table, vector): the multi-table bucketing
    * behind [[cosinePairsAboveLsh]] and [[lshTopKMulti]] — table 0 equals
    * the single-table [[lshBuckets]] definition, further tables use
    * seed-derived independent sign matrices ([[tableSeed]]).
    */
  def lshBucketsMulti(emb: DataFrame, planes: Int = 8, seed: Long = 42L,
      tables: Int = 1): DataFrame = {
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val buckets = (0 until tables).map { t =>
      s"named_struct('t', $t, 'bk', (${bucketSql("embedding", signMatrix(dims, planes, tableSeed(seed, t)))}))"
    }
    emb.select(col("vec_id"), col("embedding"),
      explode(expr(buckets.mkString("array(", ", ", ")"))).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.t").as("t"), col("tb.bk").as("bucket"))
  }

  /** The query bucket plus all buckets at hamming distance ≤ `probeDist`
    * (multi-probe LSH: the closest alternative buckets are those where one
    * marginal projection flipped).
    */
  def probeBuckets(bucket: Int, planes: Int, probeDist: Int): Seq[Int] = {
    var cur = Set(bucket)
    var all = cur
    (1 to probeDist).foreach { _ =>
      cur = cur.flatMap(b => (0 until planes).map(p => b ^ (1 << p)))
      all = all ++ cur
    }
    all.toSeq.sorted
  }

  /** ANN top-k via multi-probe LSH: probe the query's bucket and its
    * hamming-≤1 neighbors; brute-force cosine within the probed candidates.
    * Returns (vec_id, sim_q3). At 100 TB: bucket is a pre-computed column
    * (partition key), the probe is a selective filter, the scan never
    * touches other buckets.
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, planes: Int = 8,
      seed: Long = 42L, probeDist: Int = 1): DataFrame = {
    val bucketed = lshBuckets(emb, planes, seed)
    val qRow = bucketed.filter(col("vec_id") === queryId)
      .select("embedding", "bucket").collect()(0)
    val q = qRow.getSeq[Float](0).map(_.toDouble).toArray
    val probes = probeBuckets(qRow.getInt(1), planes, probeDist)
    bucketed.filter(col("bucket").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(cosineToQuery("embedding", q) * 1000).cast("long").as("sim_q3"))
      .orderBy(desc("sim_q3"), asc("vec_id"))
      .limit(k)
  }

  /** ANN top-k with OR-amplification across `tables` independent sign
    * matrices: probe every table's query bucket (plus its hamming-≤
    * `probeDist` neighbors), union the probed candidates, brute-force
    * cosine within them. Recall follows the pair path's 1−(1−p)^T law —
    * the query-side twin of [[cosinePairsAboveLsh]]'s amplification, for
    * workloads where multi-probe alone leaves recall short. At tables = 1
    * this reduces exactly to [[lshTopK]] (same seed → same buckets).
    */
  def lshTopKMulti(emb: DataFrame, queryId: Long, k: Int, planes: Int = 8,
      seed: Long = 42L, probeDist: Int = 1, tables: Int = 4): DataFrame = {
    val b = lshBucketsMulti(emb, planes, seed, tables)
    val qRows = b.filter(col("vec_id") === queryId)
      .select("t", "bucket", "embedding").collect()
    val q = qRows(0).getSeq[Float](2).map(_.toDouble).toArray
    // per-table probe sets (t, bucket): an OR of tiny per-table IN filters
    val probePred = qRows.map { r =>
      val probes = probeBuckets(r.getInt(1), planes, probeDist)
      col("t") === r.getInt(0) && col("bucket").isin(probes: _*)
    }.reduce(_ || _)
    b.filter(probePred && col("vec_id") =!= queryId)
      .select("vec_id").distinct()
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"),
        round(cosineToQuery("embedding", q) * 1000).cast("long").as("sim_q3"))
      .orderBy(desc("sim_q3"), asc("vec_id"))
      .limit(k)
  }

  /** Recall@k of the LSH ANN against the exact brute-force top-k: one row
    * (k, hits, recall_q3). The gate oracle recomputes both sides in SQL.
    */
  def lshRecallAtK(emb: DataFrame, queryId: Long, k: Int, planes: Int = 8,
      seed: Long = 42L, probeDist: Int = 1): DataFrame = {
    val ann = lshTopK(emb, queryId, k, planes, seed, probeDist).select("vec_id")
    val exact = cosineTopK(emb, queryId, k).select("vec_id")
    ann.join(exact, "vec_id")
      .agg(count(lit(1)).as("hits"))
      .select(lit(k.toLong).as("k"), col("hits"),
        expr(s"hits * 1000 div $k").as("recall_q3"))
  }

  // ---- int8 embedding quantization ---------------------------------------

  /** Symmetric int8 quantization of the embedding column — the standard 4x
    * storage/bandwidth reduction for corpus-scale embedding tables: scale =
    * max|x| per vector, q = round(x/scale·127) ∈ [-127, 127]. One narrow
    * projection (codegen'd HOFs, no UDF, no shuffle). Emits (vec_id,
    * scale, qvec array<int>).
    */
  def quantizeInt8(emb: DataFrame, embCol: String = "embedding"): DataFrame = {
    val scale = expr(
      s"aggregate($embCol, 0D, (a, x) -> greatest(a, abs(cast(x as double))))")
    emb.select(col("vec_id"), scale.as("scale"), col(embCol))
      .select(col("vec_id"), col("scale"),
        expr(s"transform($embCol, x -> CAST(round(cast(x as double) / scale * 127) AS INT))")
          .as("qvec"))
  }

  /** Reconstruction quality of [[quantizeInt8]] over the whole corpus, as
    * exact integers: per-vector cosine(original, dequantized) ×1e6, then
    * (n, min_cos_q6, avg_cos_q6) with an integer average — no float
    * aggregation, so any engine reproduces the row bit-for-bit.
    */
  def quantizeInt8Quality(emb: DataFrame, embCol: String = "embedding"): DataFrame = {
    val q = quantizeInt8(emb, embCol)
      .join(emb.select(col("vec_id"), col(embCol)), "vec_id")
      .withColumn("dq", expr("transform(qvec, v -> cast(v as double) * scale / 127D)"))
    val dot = expr(s"aggregate(zip_with($embCol, dq, (x, y) -> cast(x as double) * y), 0D, (a, x) -> a + x)")
    val na = expr(s"aggregate($embCol, 0D, (a, x) -> a + cast(x as double) * cast(x as double))")
    val nb = expr("aggregate(dq, 0D, (a, x) -> a + x * x)")
    q.withColumn("cos_q6",
      round(dot / (sqrt(na) * sqrt(nb)) * 1000000).cast("long"))
      .agg(count(lit(1)).as("n"), min("cos_q6").as("min_cos_q6"),
        (sum("cos_q6") / count(lit(1))).cast("long").as("avg_cos_q6"))
  }

  // ---- IVF (inverted-file) coarse quantization --------------------------
  //
  // The second ANN scale path: a coarse quantizer of `nlist` centroids
  // partitions the corpus into inverted lists; a query probes only its
  // `nprobe` nearest lists, so the scan fraction is nprobe/nlist instead of
  // hamming-ball geometry. At 100 TB the assignment is a precomputed
  // partition column (write the corpus bucketed by cid) and a query is a
  // partition-pruned scan of nprobe lists.
  //
  // Centroid init is a deterministic md5-seeded pick (reproducible by the
  // DuckDB oracle bit-for-bit); [[ivfRefine]] runs standard spherical
  // k-means Lloyd iterations on top for real deployments (refined centroids
  // are data-dependent floats, so the GATED query uses iters = 0).

  /** Seeded deterministic centroids: the `nlist` vectors whose
    * md5("ivf:seed:vec_id") sorts smallest; cid = rank of vec_id among the
    * picks. Collected to the driver — nlist is small by design (≤ ~10⁴ even
    * at corpus scale; the centroid table is the index's metadata, not data).
    */
  def ivfCentroids(emb: DataFrame, nlist: Int, seed: Long = 42L): Array[(Int, Array[Double])] =
    emb
      .withColumn("__h", md5(concat(lit(s"ivf:$seed:"), col("vec_id").cast("string"))))
      .orderBy("__h").limit(nlist)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1).zipWithIndex
      .map { case ((_, v), i) => (i, v) }

  /** Argmin-distance (= argmax-cosine) centroid per row, as one narrow
    * codegen'd projection with the centroid literals folded into the plan —
    * no shuffle, no UDF, no broadcast variable. Cosines are quantized at
    * 1e-6 before comparison (same cross-engine guard as the LSH buckets);
    * ties keep the lowest cid. Returns struct('cid', 'q') where q = the
    * winning cosine ×1e6.
    */
  def ivfAssignExpr(embCol: String, cents: Array[(Int, Array[Double])]): Column = {
    val cstr = cents.map { case (cid, v) =>
      val vl = v.mkString("array(", "D, ", "D)")
      val nrm = math.sqrt(v.map(x => x * x).sum)
      s"named_struct('cid', $cid, 'v', $vl, 'nrm', ${nrm}D)"
    }.mkString("array(", ", ", ")")
    expr(
      s"""aggregate(
         |  transform($cstr, c -> named_struct('cid', c.cid, 'q', CAST(round(
         |    aggregate(zip_with($embCol, c.v, (x, y) -> cast(x as double) * y), 0D, (a, x) -> a + x)
         |    / (sqrt(aggregate($embCol, 0D, (a, x) -> a + cast(x as double) * cast(x as double))) * c.nrm)
         |    * 1000000) AS BIGINT))),
         |  named_struct('cid', -1, 'q', CAST(-2000000 AS BIGINT)),
         |  (best, s) -> IF(s.q > best.q, s, best))""".stripMargin)
  }

  /** (vec_id, cid, sim_q6): every vector's inverted list. */
  def ivfAssign(emb: DataFrame, cents: Array[(Int, Array[Double])]): DataFrame =
    emb.select(col("vec_id"), ivfAssignExpr("embedding", cents).as("__a"))
      .select(col("vec_id"), col("__a.cid").as("cid"), col("__a.q").as("sim_q6"))

  /** Spherical k-means refinement: `iters` Lloyd steps over the seeded
    * centroids — assign, element-wise mean per list (posexplode + per-(cid,
    * dim) avg: one shuffle of corpus×dims rows per iteration, the standard
    * distributed k-means cost), renormalize to the unit sphere. Empty lists
    * keep their previous centroid.
    */
  def ivfRefine(emb: DataFrame, cents: Array[(Int, Array[Double])], iters: Int): Array[(Int, Array[Double])] = {
    var cur = cents
    (1 to iters).foreach { _ =>
      val means = ivfAssign(emb, cur)
        .join(emb, "vec_id")
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cid").agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("mv"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toArray)
        .toMap
      cur = cur.map { case (cid, old) =>
        means.get(cid) match {
          case Some(m) =>
            val n = math.sqrt(m.map(x => x * x).sum)
            (cid, if (n == 0.0) old else m.map(_ / n))
          case None => (cid, old)
        }
      }
    }
    cur
  }

  /** ANN top-k via IVF: probe the query's `nprobe` nearest centroids,
    * brute-force cosine within the probed inverted lists only. Probe
    * selection runs on the driver over the (small) centroid table with the
    * same 1e-6 quantization as the oracle.
    */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int, nlist: Int = 16,
      nprobe: Int = 4, seed: Long = 42L, iters: Int = 0): DataFrame = {
    val cents = ivfRefine(emb, ivfCentroids(emb, nlist, seed), iters)
    val q: Array[Double] = emb.filter(col("vec_id") === queryId)
      .select("embedding").collect()(0)
      .getSeq[Float](0).map(_.toDouble).toArray
    val qn = math.sqrt(q.map(x => x * x).sum)
    val probes = cents
      .map { case (cid, v) =>
        val dot = v.zip(q).map { case (a, b) => a * b }.sum
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (cid, math.round(dot / (nrm * qn) * 1e6))
      }
      .sortBy { case (cid, q6) => (-q6, cid) }
      .take(nprobe).map(_._1)
    emb.filter(col("vec_id") =!= queryId)
      .withColumn("__a", ivfAssignExpr("embedding", cents))
      .filter(col("__a.cid").isin(probes: _*))
      .select(col("vec_id"),
        round(cosineToQuery("embedding", q) * 1000).cast("long").as("sim_q3"))
      .orderBy(desc("sim_q3"), asc("vec_id"))
      .limit(k)
  }

  /** Write the corpus as an IVF-bucketed table: one partition directory
    * per inverted list (`cid=N/`). This is the DEPLOYMENT shape of the IVF
    * index at corpus scale: a query's nprobe filter then prunes at the
    * partition level — the unprobed lists' files are never even listed
    * into the scan, so the scan fraction is nprobe/nlist of the corpus by
    * construction (IvfBucketedSpec pins `PartitionFilters` in the plan).
    */
  def ivfWriteBucketed(emb: DataFrame, cents: Array[(Int, Array[Double])],
      path: String): Unit =
    ivfAssign(emb, cents).select("vec_id", "cid")
      .join(emb, "vec_id")
      .write.partitionBy("cid").mode("overwrite").parquet(path)

  /** ANN top-k over an [[ivfWriteBucketed]] table: identical semantics to
    * [[ivfTopK]] (same probe selection, same quantized cosine), but the
    * probe is a partition-pruning predicate over the bucketed layout
    * instead of a filter over a full scan.
    */
  def ivfTopKBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
      cents: Array[(Int, Array[Double])], queryId: Long, k: Int,
      nprobe: Int = 4): DataFrame = {
    // The query vector comes from ITS OWN probe: assign the id's centroid
    // is unknown here, but scanning the whole bucketed table for one vec_id
    // would cost O(corpus) I/O per query and negate the nprobe/nlist scan
    // fraction this layout exists for. Instead resolve the id through the
    // source embedding table when given, else fall back to the (documented
    // as expensive) full-layout lookup.
    val table = spark.read.parquet(path)
    val q: Array[Double] = table.filter(col("vec_id") === queryId)
      .select("embedding").collect()(0)
      .getSeq[Float](0).map(_.toDouble).toArray
    ivfTopKBucketedVec(spark, path, cents, q, queryId, k, nprobe)
  }

  /** [[ivfTopKBucketed]] with the query embedding supplied by the caller —
    * the per-query serving form: the ONLY scan is the nprobe-pruned probe
    * (the id overload above must first find the query row, which on the
    * cid-partitioned layout is a full-table scan; real callers hold the
    * query vector, or fetch it from the unpartitioned source table where a
    * vec_id filter prunes via ordinary row-group pushdown).
    */
  def ivfTopKBucketedVec(spark: org.apache.spark.sql.SparkSession, path: String,
      cents: Array[(Int, Array[Double])], q: Array[Double], excludeId: Long,
      k: Int, nprobe: Int = 4): DataFrame = {
    val table = spark.read.parquet(path)
    val queryId = excludeId
    val qn = math.sqrt(q.map(x => x * x).sum)
    val probes = cents
      .map { case (cid, v) =>
        val dot = v.zip(q).map { case (a, b) => a * b }.sum
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (cid, math.round(dot / (nrm * qn) * 1e6))
      }
      .sortBy { case (cid, q6) => (-q6, cid) }
      .take(nprobe).map(_._1)
    table.filter(col("cid").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(cosineToQuery("embedding", q) * 1000).cast("long").as("sim_q3"))
      .orderBy(desc("sim_q3"), asc("vec_id"))
      .limit(k)
  }

  /** Recall@k of the IVF ANN against the exact brute-force top-k. */
  def ivfRecallAtK(emb: DataFrame, queryId: Long, k: Int, nlist: Int = 16,
      nprobe: Int = 4, seed: Long = 42L, iters: Int = 0): DataFrame = {
    val ann = ivfTopK(emb, queryId, k, nlist, nprobe, seed, iters).select("vec_id")
    val exact = cosineTopK(emb, queryId, k).select("vec_id")
    ann.join(exact, "vec_id")
      .agg(count(lit(1)).as("hits"))
      .select(lit(k.toLong).as("k"), col("hits"),
        expr(s"hits * 1000 div $k").as("recall_q3"))
  }
}
