package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{IndexStore, IvfPq}
import graft.sources.Tables

/** Build-once/query-many index lifecycle: the stored-index query path
  * returns exactly the inline (retrain-every-time) results, rebuilds are
  * deterministic, and the codes table is partitioned by cell. */
class IndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = {
    GraftSession.tune(spark)
    Tables.load(spark, TestSpark.sf("sf0.001"), "embeddings")
  }

  test("stored-index query equals the inline IVF-PQ query") {
    IndexStore.buildIvfPq(spark, emb, "annidx", "emb")
    val queries = emb.where(col("vec_id") < 10)
    val stored = IndexStore.queryIvfPq(spark, queries, "annidx", "emb", k = 3)
    val inline = IvfPq.topKApprox(emb, queries, k = 3)
    assert(stored.except(inline).count() == 0 && inline.except(stored).count() == 0)
    assert(stored.count() > 0)
  }

  test("rebuild is deterministic: same tables bit-for-bit") {
    IndexStore.buildIvfPq(spark, emb, "annidx", "emb2")
    val codes1 = spark.table("annidx.emb2_codes").collect().toSeq
    IndexStore.buildIvfPq(spark, emb, "annidx", "emb2")
    spark.catalog.refreshTable("annidx.emb2_codes")
    val codes2 = spark.table("annidx.emb2_codes").collect().toSeq
    assert(codes1.toSet == codes2.toSet)
    assert(spark.table("annidx.emb2_centroids").count() == 16)
  }

  test("codes table is partitioned by cell (probes prune partitions)") {
    IndexStore.buildIvfPq(spark, emb, "annidx", "emb3")
    val parts = spark.sql("SHOW PARTITIONS annidx.emb3_codes").collect()
    assert(parts.nonEmpty && parts.forall(_.getString(0).startsWith("cell=")))
    // one-cell read plans a partition-pruned scan
    val one = spark.table("annidx.emb3_codes").where(col("cell") === 0)
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && !plan.contains("PartitionFilters: []"),
      s"cell filter did not reach partition pruning:\n$plan")
  }
}
