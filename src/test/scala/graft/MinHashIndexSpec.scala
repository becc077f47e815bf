package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, MinHashIndex}
import graft.sources.Tables

/** Build-once/query-many MinHash index lifecycle: the stored-index query
  * path returns exactly the inline incremental results, rebuilds are
  * deterministic, and — the 100 TB point — the standing bands table joins
  * on its bucket keys with ZERO Exchange on the corpus-sized side. */
class MinHashIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs = {
    GraftSession.tune(spark)
    Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
      .select("doc_id", "text")
  }
  private lazy val history = docs.where(col("doc_id") % 2 === 0)
  private lazy val delta = docs.where(col("doc_id") % 2 === 1)

  test("stored-index query equals the inline incremental pipeline") {
    MinHashIndex.build(spark, history, "dedupidx", "docs")
    val stored = MinHashIndex.queryPairs(spark, history, delta,
      "dedupidx", "docs", threshold = 0.8)
    val inline = Dedup.minHashLshPairsIncremental(history, delta, 0.8)
    assert(stored.except(inline).count() == 0 &&
      inline.except(stored).count() == 0)
    assert(stored.count() > 0)
  }

  test("rebuild is deterministic: same tables bit-for-bit") {
    MinHashIndex.build(spark, history, "dedupidx", "docs2")
    val s1 = spark.table(MinHashIndex.sigsTable("dedupidx", "docs2"))
      .collect().toSet
    MinHashIndex.build(spark, history, "dedupidx", "docs2")
    spark.catalog.refreshTable(MinHashIndex.sigsTable("dedupidx", "docs2"))
    val s2 = spark.table(MinHashIndex.sigsTable("dedupidx", "docs2"))
      .collect().toSet
    assert(s1 == s2 && s1.nonEmpty)
  }

  test("standing bands table joins exchange-free on its bucket keys") {
    MinHashIndex.build(spark, history, "dedupidx", "docs3")
    // pin SortMergeJoin (a broadcast would also hide the exchange) and
    // probe the exact join shape queryPairs runs: delta bands vs the
    // standing table on (band, band_key)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val bandsD =
        Dedup.bandKeys(Dedup.minHashSignatures(delta)).as("a")
      val bandsH = spark.table(MinHashIndex.bandsTable("dedupidx", "docs3")).as("b")
      val j = bandsD.join(bandsH,
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      j.collect()
      // exactly one shuffle: the batch-sized delta side. The bucketed
      // standing scan must reach its join with no Exchange above it.
      // Count on the FINAL plan only — AQE's toString also prints the
      // initial plan, which would double-count the one exchange.
      val plan = j.queryExecution.executedPlan.toString
      val finalPlan = plan.split("== Initial Plan ==").head
      val exchanges = "Exchange hashpartitioning".r
        .findAllMatchIn(finalPlan).size
      assert(exchanges == 1,
        s"expected 1 exchange (delta side only), found $exchanges:\n$plan")
      assert(finalPlan.contains("SelectedBucketsCount"),
        s"standing side did not use its bucketed layout:\n$plan")
    } finally spark.conf.set(key, prev)
  }
}
