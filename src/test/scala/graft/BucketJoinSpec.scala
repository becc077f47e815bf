package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.Tables

/** Bucketed co-located joins: the write-once/join-forever layout. The
  * assertions are on PLAN SHAPE — zero Exchange (shuffle) operators in a
  * join and an aggregation over same-bucketed tables — because at 100 TB
  * the absent shuffle IS the feature; row-level correctness is checked
  * against the plain join on the unbucketed source. */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf("sf0.001")

  private def withNoBroadcast[A](f: => A): A = {
    // pin SortMergeJoin: a broadcast join is also Exchange-shaped
    // (BroadcastExchange) and would mask what the bucketing provides
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prev)
  }

  test("same-bucketed tables join with zero Exchange and zero shuffle") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"),
        col("o_totalprice"))
    val cust = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("custkey"), col("c_name"),
        col("c_acctbal"))
    Layout.bucketedWrite(orders, "bj_orders", "custkey", buckets = 8)
    Layout.bucketedWrite(cust, "bj_customer", "custkey", buckets = 8)
    try withNoBroadcast {
      val joined = Layout.bucketedJoin(spark, "bj_orders", "bj_customer", "custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"expected a co-located sort-merge join:\n$plan")
      // correctness: identical row count to the plain unbucketed join
      val expected = orders.join(cust, Seq("custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_orders")
      spark.sql("DROP TABLE IF EXISTS bj_customer")
    }
  }

  test("aggregation on the bucket key needs no shuffle either") {
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    Layout.bucketedWrite(orders, "bj_agg", "custkey", buckets = 8)
    try {
      val agg = spark.table("bj_agg").groupBy("custkey")
        .agg(count(lit(1)).as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS bj_agg")
  }
}
