package org.apache.spark.sql

/** Test-only window into the session's CacheManager (`sharedState` is
  * private[sql]): StreamingCacheHygieneSpec needs "no cached plan
  * survives the micro-batch" as a hard assertion, and the public
  * persistent-RDD map under-reports cached-but-unmaterialized plans. */
object CacheStateProbe {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
