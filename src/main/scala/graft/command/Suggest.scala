package graft.command

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The suggest command family (reference plugins/suggest/suggest.c:524-1024,
  * modes complete / correct / suggest) re-expressed over learned frequency
  * tables instead of the reference's event-hook-maintained index tables:
  *
  *   - `learn` distills a raw query log (user, ts, query) into the two
  *     tables the reference maintains via its load hooks: per-query
  *     frequency (items) and within-session co-occurrence (pairs) — one
  *     window + one aggregation each, shuffle keyed by user then by pair.
  *   - `complete` = prefix completion (reference PAT prefix cursor →
  *     sargable startsWith over the items table).
  *   - `correct`  = edit-distance correction (reference fuzzy search).
  *   - `suggest`  = related queries by co-occurrence frequency.
  *
  * All rankings: frequency desc, then key asc (deterministic).
  */
object Suggest {

  /** (items(item, freq), pairs(query, related, freq)) from a query log.
    * Co-occurrence = consecutive queries of the same user within
    * `sessionGapSec` (the reference's suggest-learner pairs submitted
    * queries the same way).
    */
  def learn(log: DataFrame, sessionGapSec: Long = 600L): (DataFrame, DataFrame) = {
    val items = log.groupBy(col("query").as("item"))
      .agg(count(lit(1)).as("freq"))
    // Skew guard: a window partitioned by raw `user` makes one bot account
    // with 10⁸ log rows a single window partition on one task. Bucket by
    // (user, coarse time) instead — partitions stay bounded by the bot's
    // per-bucket volume — then recover the pairs that straddle a bucket
    // boundary EXACTLY: two consecutive rows within the session gap can be
    // at most one bucket apart (bucketSec ≥ sessionGapSec), and the
    // straddling pair is always (last event of bucket k, first event of
    // bucket k+1) — a bounded per-(user,bucket) aggregate + an adjacent-
    // bucket self-join, both hash-keyed with map-side combine.
    // The bucket is the SMALLEST the exactness constraint allows (one
    // hour, or the session gap if larger): a bot putting 10⁸ events into
    // one single day still spreads over ≥24 partitions, bounding window
    // width absolutely, not per-day.
    val bucketSec = math.max(3600L, sessionGapSec)
    val withB = log.withColumn("__b", floor(col("ts") / bucketSec))
    val w = Window.partitionBy("user", "__b").orderBy("ts")
    val inBucket = withB
      .withColumn("prev_query", lag("query", 1).over(w))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .filter(col("prev_query").isNotNull &&
        col("prev_query") =!= col("query") &&
        (col("ts") - col("prev_ts")) <= sessionGapSec)
      .select(col("prev_query").as("query"), col("query").as("related"))
    val edges = withB.groupBy("user", "__b").agg(
      min_by(col("query"), col("ts")).as("first_q"), min("ts").as("first_ts"),
      max_by(col("query"), col("ts")).as("last_q"), max("ts").as("last_ts"))
    val a = edges.select(col("user"), col("__b"),
      col("last_q"), col("last_ts"))
    val b = edges.select(col("user"), (col("__b") - 1).as("__b"),
      col("first_q"), col("first_ts"))
    val boundary = a.join(b, Seq("user", "__b"))
      .filter(col("first_ts") - col("last_ts") <= sessionGapSec &&
        col("last_q") =!= col("first_q"))
      .select(col("last_q").as("query"), col("first_q").as("related"))
    val pairs = inBucket.unionByName(boundary)
      .groupBy("query", "related")
      .agg(count(lit(1)).as("freq"))
    (items, pairs)
  }

  def complete(items: DataFrame, prefix: String, limit: Int = 10): DataFrame =
    items.filter(col("item").startsWith(prefix))
      .orderBy(desc("freq"), asc("item")).limit(limit)

  def correct(items: DataFrame, query: String, maxDistance: Int = 1, limit: Int = 10): DataFrame =
    items.filter(levenshtein(col("item"), lit(query)) <= maxDistance &&
        col("item") =!= query)
      .orderBy(desc("freq"), asc("item")).limit(limit)

  def suggest(pairs: DataFrame, query: String, limit: Int = 10): DataFrame =
    pairs.filter(col("query") === query)
      .select(col("related"), col("freq"))
      .orderBy(desc("freq"), asc("related")).limit(limit)
}
