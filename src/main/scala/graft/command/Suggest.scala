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
    val w = Window.partitionBy("user").orderBy("ts")
    val pairs = log
      .withColumn("prev_query", lag("query", 1).over(w))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .filter(col("prev_query").isNotNull &&
        col("prev_query") =!= col("query") &&
        (col("ts") - col("prev_ts")) <= sessionGapSec)
      .groupBy(col("prev_query").as("query"), col("query").as("related"))
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
