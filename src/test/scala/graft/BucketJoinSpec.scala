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

  test("cdcCounts never shuffles a key-bucketed history (keys-only, exchange-free)") {
    // Reconcile.cdcCounts documents that its history-side key distinct
    // plans exchange-free when the history is key-bucketed (the default
    // incremental-merge layout). Pin it: with broadcasts disabled (a
    // BroadcastExchange would mask the claim), no ShuffleExchange subtree
    // in the executed plan may contain the bucketed history scan — the
    // distinct rides the bucketing and the join reuses its partitioning.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val hist = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"),
        col("o_orderdate").as("last_modified"))
    Layout.bucketedWrite(hist, "cdc_hist", "k", buckets = 8)
    try withNoBroadcast {
      import spark.implicits._
      val ks = spark.table("cdc_hist").select("k").orderBy("k")
        .limit(2).as[Long].collect()
      val delta = Seq(
        (ks(0), "2024-01-02", None: Option[Int]), // update (latest wins)
        (ks(0), "2024-01-01", Some(1)),           // superseded intra-batch
        (ks(1), "2024-01-02", Some(1)),           // soft delete
        (-1L, "2024-01-02", None: Option[Int]),   // insert
        (-2L, "2024-01-02", Some(1)))             // delete of a never-key
        .toDF("k", "last_modified", "deleted")
      val card = graft.operators.Reconcile.cdcCounts(
        spark.table("cdc_hist"), delta, Seq("k"), "last_modified",
        softDeleteCol = Some("deleted"))
      val row = card.collect().head
      assert(row.getLong(0) == 5 && row.getLong(1) == 4 && // n_rows, n_keys
        row.getLong(2) == 1 && row.getLong(3) == 1 &&      // insert, update
        row.getLong(4) == 1 && row.getLong(5) == 1,        // soft-del, noop
        s"unexpected CDC card: $row")
      def kids(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      def hasHistScan(p: SparkPlan): Boolean =
        (p.children.isEmpty && p.toString.contains("cdc_hist")) ||
          kids(p).exists(hasHistScan)
      // a SinglePartition exchange merges the one-row-per-partition output
      // of the global partial aggregate — it sits above everything and
      // moves no history rows; only a hash repartition of a subtree that
      // contains the history scan would mean history data crossed the wire
      def shuffledHist(p: SparkPlan): Boolean = p match {
        case s: ShuffleExchangeLike
            if !s.outputPartitioning.toString.contains("SinglePartition") &&
              hasHistScan(s) => true
        case o => kids(o).exists(shuffledHist)
      }
      val plan = card.queryExecution.executedPlan
      assert(hasHistScan(plan), "sanity: history scan not found in plan")
      assert(!shuffledHist(plan),
        s"bucketed history was shuffled by cdcCounts:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS cdc_hist")
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
