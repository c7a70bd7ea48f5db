package org.apache.spark.sql

/** Visibility into the session's Dataset cache (CacheManager) — the
  * structure a leaked `persist` pins for the session's lifetime. Lives in
  * org.apache.spark.sql only to cross the `private[sql]` boundary of
  * `sharedState`; adds no behavior. Used by the dedup pipeline leak spec
  * to assert entry points release every persist they take.
  */
object GraftCacheBridge {
  def datasetCacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
