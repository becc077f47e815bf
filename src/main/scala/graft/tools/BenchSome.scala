package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only targeted bench (not part of the driver contract): median-of-3
  * timings for the named queries only, so a hot spot can be re-measured
  * in isolation without paying for the full suite (and without the
  * cross-run contention that pollutes full-suite spreads).
  *
  * Usage: runMain graft.tools.BenchSome <query> [query ...]
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchSome <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val unknown = args.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // codegen warmup at the smallest SF, same as graft.Bench
    args.foreach(n => qs(n)(spark, "/root/testdata/sf0.001").count())
    args.foreach { n =>
      val ts = (1 to 3).map { _ =>
        // identical methodology to graft.Bench: every pass starts COLD —
        // without clearCache, passes 2-3 read pass 1's persisted
        // intermediates (and plan-canonicalized CacheManager hits survive
        // unpersist on derived frames), so the median would measure warm
        // state and be incomparable to the suite's cold medians.
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        qs(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$n%-28s median=${ts(1)}%6.2f s  (min=${ts.head}%.2f max=${ts.last}%.2f)")
    }
    spark.stop()
  }
}
