package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.BenchShared

/** The bench-layout hoist (round-12 verdict item 1) must be invisible to
  * results: every pair-family query returns EXACTLY the same rows whether
  * it derives the MinHash signatures/pairs inline (the Verify/correctness
  * path — BenchShared never armed) or reads them from the armed standing
  * parquet index (the bench-worker path). A drift here would mean the
  * bench times a different computation than the one the oracle certifies.
  */
class BenchSharedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // One representative per consumer shape: connected-components consumer,
  // plain pair aggregate, signature+pair calibration join, cross-file
  // consumer (TextQueries), split-graph consumer.
  private val family = Seq(
    "dedup_clusters", "dedup_jaccard_hist", "dedup_minhash_est_quality",
    "dedup_minhash_bbit", "corpus_report", "split_leakage",
    "dedup_degree_hist", "dedup_cluster_size_hist",
    "dedup_apply", "dedup_apply_best")

  test("armed standing-index reads return exactly the derived results") {
    BenchShared.disarmAll()
    val derived = family.map { n =>
      n -> SparkEntry.queries(n)(spark, dir).collect().toSeq
    }.toMap
    try {
      val first = BenchShared.arm(spark, dir)
      assert(first > 0.0, "first arm() must actually derive")
      assert(BenchShared.arm(spark, dir) == 0.0, "re-arm must be a no-op")
      assert(BenchShared.pairs(spark, dir).isDefined)
      assert(BenchShared.sigs(spark, dir).isDefined)
      family.foreach { n =>
        val armed = SparkEntry.queries(n)(spark, dir).collect().toSeq
        assert(armed == derived(n), s"$n drifted under the armed index")
      }
    } finally BenchShared.disarmAll()
    assert(BenchShared.pairs(spark, dir).isEmpty, "disarm must clear lookup")
  }

  // One per training shape: coarse-quantizer consumer (IVF top-k),
  // semantic-pairs consumer (kmeans dedup), both-trainings consumer
  // (IVF-PQ), residual-books consumer (IVFADC).
  private val annFamily = Seq(
    "sim_ann_ivf", "dedup_semantic_kmeans", "sim_ann_ivfpq", "sim_ann_ivfadc",
    "emb_prototypicality")

  test("memoized trainings return exactly the inline-trained results") {
    import graft.sim.TrainingMemo
    assert(!TrainingMemo.enabled, "memo must be off outside bench workers")
    val derived = annFamily.map { n =>
      n -> SparkEntry.queries(n)(spark, dir).collect().toSeq
    }.toMap
    try {
      sys.props("graft.bench.memoTraining") = "1"
      // first pass populates the memo, second is served from it — both
      // must equal the inline-trained truth
      (1 to 2).foreach { pass =>
        annFamily.foreach { n =>
          val memoized = SparkEntry.queries(n)(spark, dir).collect().toSeq
          assert(memoized == derived(n), s"$n drifted under the memo (pass $pass)")
        }
      }
      assert(TrainingMemo.size > 0, "trainings were never memoized")
      assert(TrainingMemo.drainDerivedSeconds() > 0.0)
      assert(TrainingMemo.drainDerivedSeconds() == 0.0,
        "drain must reset the derive counter")
    } finally {
      sys.props.remove("graft.bench.memoTraining")
      TrainingMemo.clear()
    }
    assert(TrainingMemo.size == 0)
  }
}
