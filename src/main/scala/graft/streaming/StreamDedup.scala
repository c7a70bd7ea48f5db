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
      .dropDuplicates("digest")

  /** Per-bucket membership: docIds already seen in one (band, bucket). */
  case class BucketState(docIds: Array[Long])

  /** Streaming MinHash-LSH near-dup candidates: for each arriving doc, emit
    * (a, b) with a < b against every doc already seen in any shared LSH
    * bucket. Deterministic — on the same corpus the union of emitted pairs
    * equals the batch [[Dedup.lshCandidatePairs]] output (modulo the
    * `maxBucketDocs` cap; pairs may repeat across bands/micro-batches, so
    * consumers dedup downstream, e.g. `.dropDuplicates` in the sink batch).
    */
  def nearDupCandidates(
      stream: DataFrame,
      textCol: String = "text",
      numPerm: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      seed: Long = 42L,
      maxBucketDocs: Int = 64
  ): Dataset[(Long, Long)] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(
      stream.select(col("doc_id"), col(textCol)), textCol, numPerm, shingleK, seed)
    val bandRows = sigs
      .select(col("doc_id"), explode(Dedup.lshBandRowsExpr(numPerm, bands)).as("bb"))
      .select(col("doc_id").cast("long"), col("bb.band"), col("bb.bucket"))
      .as[(Long, Int, Long)]
    bandRows
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BucketState, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[BucketState]) =>
          var seen = state.getOption.map(_.docIds).getOrElse(Array.empty[Long])
          val out = Seq.newBuilder[(Long, Long)]
          rows.foreach { case (d, _, _) =>
            if (!seen.contains(d)) {
              seen.foreach(s => out += (if (s < d) (s, d) else (d, s)))
              if (seen.length < maxBucketDocs) seen = seen :+ d
            }
          }
          state.update(BucketState(seen))
          out.result().iterator
      }
  }
}
