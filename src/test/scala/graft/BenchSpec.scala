package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.BenchShared
import graft.sim.TrainingMemo

/** The round-14 bench-harness hygiene rules (round-13 advice), pinned at
  * the `Bench.measure` level with small injected data dirs:
  *
  *  1. The ANN training memo is armed in a try/finally scoped to the
  *     measurement — the in-process fallback path used to leave the
  *     parent session armed for every subsequent shard, silently serving
  *     memoized trainings to queries whose time was supposed to include
  *     the inline derivation.
  *  2. A real hoist reports its seconds once; an already-armed re-arm
  *     (second pair-family shard falling back in the same JVM) must NOT
  *     re-emit a 0.0 pseudo entry that would overwrite the recorded
  *     hoist seconds in the parent's `hoisted` map.
  *  3. Derive time accrued AFTER the target-SF pre-pass surfaces instead
  *     of being silently lost: warm-dir trainings under
  *     `__shared_ann_training_warm` (untimed arming, counted in
  *     hoisted_s), timed-pass re-derivations under
  *     `__shared_ann_training_residual` (visibility only — those seconds
  *     already sit inside the query's samples, so the sum excludes them).
  */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val small = TestSpark.sf("sf0.001")
  private val mid = TestSpark.sf("sf0.01")

  test("ann memo arm is scoped to measure() and hoists report honestly") {
    TrainingMemo.clear()
    assert(!TrainingMemo.enabled, "memo must be off before measure")
    try {
      val first = Bench.measure(spark, Seq("sim_ann_ivf"), nRuns = 1,
        sf = mid, warm = small).toMap
      assert(!TrainingMemo.enabled,
        "measure() must clear graft.bench.memoTraining before returning " +
          "(in-process fallback would otherwise stay armed for later shards)")
      assert(first.contains("sim_ann_ivf") && first("sim_ann_ivf").nonEmpty)
      val hoist = first.getOrElse("__shared_ann_training", Seq.empty)
      assert(hoist.nonEmpty && hoist.head > 0.0,
        "first measurement must report the target-SF training hoist")
      // The warm pass runs AFTER the pre-pass drain and trains at the warm
      // dir — that derive time must surface under its own untimed-arming
      // name, not vanish (r13 advice item 4). The residual entry is
      // reserved for TIMED-pass re-derivations (double-count visibility)
      // and must be absent in this clean flow.
      val warm = first.getOrElse("__shared_ann_training_warm", Seq.empty)
      assert(warm.nonEmpty && warm.head > 0.0,
        "warm-dir trainings after the pre-pass drain must be reported as the warm hoist")
      assert(!first.contains("__shared_ann_training_residual"),
        "no timed-pass re-derivation happened, so no residual may be claimed")

      // Second measurement in the same JVM (fallback-shard shape): every
      // training is already memoized, so no pseudo entry may be emitted —
      // a 0.0 entry would overwrite the recorded hoist in the parent map.
      val second = Bench.measure(spark, Seq("sim_ann_ivf"), nRuns = 1,
        sf = mid, warm = small).toMap
      assert(!TrainingMemo.enabled)
      assert(!second.contains("__shared_ann_training"),
        "already-memoized shard must not emit a 0.0 hoist entry")
      assert(!second.contains("__shared_ann_training_warm"))
      assert(!second.contains("__shared_ann_training_residual"))
    } finally {
      sys.props.remove("graft.bench.memoTraining")
      TrainingMemo.clear()
    }
  }

  test("pair-family re-arm in the same JVM does not re-emit a 0.0 hoist") {
    BenchShared.disarmAll()
    try {
      val first = Bench.measure(spark, Seq("dedup_jaccard_hist"), nRuns = 1,
        sf = mid, warm = small).toMap
      val hoist = first.getOrElse("__shared_minhash_derivation", Seq.empty)
      assert(hoist.nonEmpty && hoist.head > 0.0,
        "first pair-family measurement must report the derivation hoist")
      val second = Bench.measure(spark, Seq("dedup_jaccard_hist"), nRuns = 1,
        sf = mid, warm = small).toMap
      assert(!second.contains("__shared_minhash_derivation"),
        "already-armed shard must not overwrite the hoist with 0.0")
      assert(second("dedup_jaccard_hist").nonEmpty)
    } finally BenchShared.disarmAll()
  }
}
