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
  * Scale path: random-hyperplane LSH — per-row signature (narrow map),
  * shuffle keyed by bucket, candidate search within buckets only. Hyperplanes
  * are generated from a seeded deterministic RNG so signatures are
  * reproducible across runs/cluster sizes.
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

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic unit-less gaussian-ish hyperplanes: dims × planes matrix
    * from a seeded counter RNG (sum of 4 uniforms − 2, CLT-approx normal —
    * adequate for sign-random-projection).
    */
  def hyperplanes(dims: Int, planes: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(planes) { p =>
      Array.tabulate(dims) { d =>
        var s = 0.0
        var i = 0L
        while (i < 4) {
          val bits = splitmix64(seed ^ (p.toLong << 32) ^ (d.toLong << 8) ^ i)
          s += (bits >>> 11).toDouble / (1L << 53).toDouble
          i += 1
        }
        s - 2.0
      }
    }

  /** Sign-random-projection LSH bucket id per row: one bit per hyperplane.
    * Rows in the same bucket are ANN candidates; search brute-forces within
    * the bucket (plus optionally neighboring buckets for recall).
    */
  def lshBuckets(emb: DataFrame, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val hp = hyperplanes(dims, planes, seed)
    val hpB = spark.sparkContext.broadcast(hp)
    val bucketUdf = udf { (e: Seq[Float]) =>
      val h = hpB.value
      var sig = 0
      var p = 0
      while (p < h.length) {
        var dot = 0.0
        var d = 0
        val row = h(p)
        while (d < row.length && d < e.length) { dot += e(d) * row(d); d += 1 }
        if (dot >= 0) sig |= (1 << p)
        p += 1
      }
      sig
    }
    emb.withColumn("bucket", bucketUdf(col("embedding")))
  }

  /** ANN top-k via LSH: probe = query's bucket; brute-force cosine within it.
    * Returns (vec_id, sim_q3). Recall < 1 by construction; the baseline
    * [[cosineTopK]] is the oracle to measure recall against.
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val bucketed = lshBuckets(emb, planes, seed)
    val qRow = bucketed.filter(col("vec_id") === queryId)
      .select("embedding", "bucket").collect()(0)
    val q = qRow.getSeq[Float](0).map(_.toDouble).toArray
    val qBucket = qRow.getInt(1)
    bucketed.filter(col("bucket") === qBucket && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(cosineToQuery("embedding", q) * 1000).cast("long").as("sim_q3"))
      .orderBy(desc("sim_q3"), asc("vec_id"))
      .limit(k)
  }
}
