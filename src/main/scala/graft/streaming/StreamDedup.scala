package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication for training-data ingest pipelines: the batch
  * operators of [[graft.ops.Dedup]] re-expressed over Structured Streaming so
  * a document firehose can be deduplicated as it lands, instead of via
  * periodic whole-corpus batch jobs.
  *
  *   - exact: watermarked `dropDuplicates` on the content digest — Spark's
  *     stateful dedup operator; state is keyed by digest (uniform, no skew)
  *     and aged out past the watermark, so state size is bounded by the
  *     dedup horizon rather than the corpus.
  *   - near-dup: the same deterministic MinHash→LSH banding as the batch
  *     path (identical signatures, identical buckets), with bucket
  *     membership held in `flatMapGroupsWithState` keyed by (band, bucket) —
  *     each arriving doc emits candidate pairs against the docs already
  *     seen in its buckets. State is naturally partitioned by the LSH key;
  *     hot buckets are capped (a bucket holding everything is an exact-dup
  *     cluster the exact path already catches).
  *
  * Scale shape: both operators shuffle once per micro-batch on a uniform
  * key (digest / band-bucket) — the streaming analogue of the batch
  * operators' single-shuffle designs, so a 1000-executor cluster partitions
  * the state the same way it partitions the batch join.
  */
object StreamDedup {

  /** Exact streaming dedup: emit only the first document per content
    * digest. `tsCol` is the event-time column the watermark ages state by.
    *
    * Uses `dropDuplicatesWithinWatermark`, whose state IS evicted once the
    * watermark passes a digest's event time — plain `dropDuplicates` on a
    * key subset that excludes the event-time column never evicts, so its
    * state grows with the corpus. The semantic trade is the documented one:
    * dedup is guaranteed only for duplicates arriving within the watermark
    * delay of each other (the dedup horizon); a duplicate arriving after
    * the horizon re-emits, which is the intended bounded-state behavior.
    */
  def exactDedup(
      stream: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      watermark: String = "10 minutes"
  ): DataFrame =
    stream
      .withColumn("digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Per-bucket membership: docIds already seen in one (band, bucket). */
  case class BucketState(docIds: Array[Long])

  /** Streaming MinHash-LSH near-dup candidates: for each arriving doc, emit
    * (a, b) with a < b against every doc already seen in any shared LSH
    * bucket. Deterministic — on the same corpus the union of emitted pairs
    * equals the batch [[Dedup.lshCandidatePairs]] output (modulo the
    * `maxBucketDocs` cap; pairs may repeat across bands/micro-batches, so
    * consumers dedup downstream, e.g. `.dropDuplicates` in the sink batch).
    *
    * State horizon: with `tsCol` set, the stream is watermarked and idle
    * (band, bucket) groups age out via EventTimeTimeout once the watermark
    * passes their last activity + the horizon — mirroring the exact path's
    * bounded-state semantics (the number of live buckets is then bounded by
    * the horizon's traffic, not the corpus). With `tsCol = None` state is
    * kept forever (NoTimeout) — a bounded-corpus/test mode only.
    */
  def nearDupCandidates(
      stream: DataFrame,
      textCol: String = "text",
      numPerm: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      seed: Long = 42L,
      maxBucketDocs: Int = 64,
      tsCol: Option[String] = None,
      horizonMs: Long = 600000L
  ): Dataset[(Long, Long)] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val withTs = tsCol match {
      case Some(tc) => stream
        .select(col("doc_id").cast("long"), col(textCol).cast("string"),
          col(tc).cast("timestamp").as("__ts"))
      case None => stream
        .select(col("doc_id").cast("long"), col(textCol).cast("string"),
          lit(null).cast("timestamp").as("__ts"))
    }
    // one narrow kernel pass carries the event-time column alongside the
    // band rows (same md5/permutation math as the batch minhashBands —
    // DedupKernelSpec pins the kernel to the SQL specification); the
    // watermark is declared on the DERIVED rows, after the typed map, since
    // object serialization strips the event-time tag from upstream columns
    require(numPerm % bands == 0, s"numPerm $numPerm not divisible by bands $bands")
    val (aC, cC) = Dedup.permCoeffs(numPerm, seed)
    val bandDf = withTs.as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text, ts) =>
          Dedup.bandBucketsOf(md, text, aC, cC, bands, shingleK, seed)
            .zipWithIndex.map { case (bucket, b) => (id, b, bucket, ts) }
        }
      }
      .toDF("doc_id", "band", "bucket", "__ts")
    val bandRows = (if (tsCol.isDefined)
        bandDf.withWatermark("__ts", s"$horizonMs milliseconds")
      else bandDf)
      .as[(Long, Int, Long, java.sql.Timestamp)]
    val timeoutConf =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val useTimeout = tsCol.isDefined
    bandRows
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BucketState, (Long, Long)](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (useTimeout && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.map(_.docIds).getOrElse(Array.empty[Long])
            val out = Seq.newBuilder[(Long, Long)]
            var maxTsMs = Long.MinValue
            rows.foreach { case (d, _, _, ts) =>
              if (ts != null && ts.getTime > maxTsMs) maxTsMs = ts.getTime
              if (!seen.contains(d)) {
                seen.foreach(s => out += (if (s < d) (s, d) else (d, s)))
                if (seen.length < maxBucketDocs) seen = seen :+ d
              }
            }
            state.update(BucketState(seen))
            // Timeout anchors on the group's own max EVENT time, not just the
            // current watermark: in the first micro-batch the watermark is
            // still epoch-0, and watermark+horizon would evict this bucket
            // the moment the watermark first advances — losing cross-batch
            // pairs well inside the horizon. max(watermark, event) + horizon
            // keeps the documented guarantee (duplicates arriving within the
            // horizon of each other always pair) and still satisfies Spark's
            // timeout >= watermark requirement.
            if (useTimeout)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs(), maxTsMs) + horizonMs)
            out.result().iterator
          }
      }
  }
}
