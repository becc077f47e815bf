package graft

import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Range-join correctness against the brute-force containment definition,
  * including intervals spanning many buckets and bucket-boundary edges. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketized interval join equals the brute-force definition") {
    val rnd = new scala.util.Random(41)
    val points = (1 to 800).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val intervals = (1 to 200).map { i =>
      val s = rnd.nextInt(950).toLong
      (rnd.nextInt(10).toLong, s, s + rnd.nextInt(200).toLong, i.toLong)
    }
    val got = RangeJoin.intervalJoin(
      points.toDF("k", "t", "pid"), intervals.toDF("k", "start", "end", "iid"),
      key = "k", time = "t", start = "start", end = "end", bucketWidth = 64L)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (pk, t, pid) <- points
      (ik, s, e, iid) <- intervals
      if pk == ik && t >= s && t <= e
    } yield (pid, iid)).toSet
    assert(got == expected)
  }

  test("derived width: long-interval skew keeps the explode factor bounded") {
    val rnd = new scala.util.Random(43)
    // 300 typical intervals (span ~80-120) + 3 pathological ones (span
    // 100000): the MEDIAN-derived width must ignore the tail, where a
    // mean-derived (or guessed-too-narrow) width would not.
    val typical = (1 to 300).map { i =>
      val s = rnd.nextInt(5000).toLong
      (rnd.nextInt(10).toLong, s, s + 80 + rnd.nextInt(40).toLong, i.toLong)
    }
    val skewed = (301 to 303).map { i =>
      (rnd.nextInt(10).toLong, 0L, 100000L, i.toLong)
    }
    val intervals = (typical ++ skewed).toDF("k", "start", "end", "iid")
    val w = RangeJoin.derivedBucketWidth(intervals, "start", "end")
    // near the typical span (median ~100, mean/8 ~137), NOT the tail-
    // dragged mean (~1090) and NOT a degenerate narrow value
    assert(w >= 80 && w <= 300, s"derived width $w not near the typical span")
    // total exploded bucket rows stay O(n) + tail span/width
    val explodedRows = intervals
      .select(expr(s"sum(end DIV $w - start DIV $w + 1)")).head().getLong(0)
    assert(explodedRows <= 300 * 3 + 3 * (100000 / w + 2),
      s"explode factor unbounded: $explodedRows rows at width $w")

    // all-point-intervals (span 0) must not degenerate to unit buckets
    // when values are huge epochs — the mean/8 floor handles median 0
    val zeros = (1 to 50).map(i => (1L, i * 1000000000L, i * 1000000000L, i.toLong))
      .toDF("k", "start", "end", "iid")
    assert(RangeJoin.derivedBucketWidth(zeros, "start", "end") == 1L)

    val points = (1 to 500).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100000).toLong, i.toLong)).toDF("k", "t", "pid")
    val got = RangeJoin.intervalJoin(points, intervals, "k", "t", "start", "end")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pts = points.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ivs = intervals.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (for {
      (pk, t, pid) <- pts
      (ik, s, e, iid) <- ivs
      if pk == ik && t >= s && t <= e
    } yield (pid, iid)).toSet
    assert(got == expected)
  }

  test("overlap join equals brute force and emits each pair exactly once") {
    val rnd = new scala.util.Random(47)
    val as = (1 to 200).map { i =>
      val s = rnd.nextInt(950).toLong
      (rnd.nextInt(10).toLong, s, s + rnd.nextInt(300).toLong, i.toLong)
    }
    val bs = (1 to 200).map { i =>
      val s = rnd.nextInt(950).toLong
      (rnd.nextInt(10).toLong, s, s + rnd.nextInt(150).toLong, i.toLong)
    }
    val got = RangeJoin.overlapJoin(
      as.toDF("k", "as_", "ae", "aid"), bs.toDF("k", "bs_", "be", "bid"),
      key = "k", aStart = "as_", aEnd = "ae", bStart = "bs_", bEnd = "be",
      bucketWidth = 64L)
      .select("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = (for {
      (ak, s1, e1, aid) <- as
      (bk, s2, e2, bid) <- bs
      if ak == bk && s1 <= e2 && s2 <= e1
    } yield (aid, bid)).toSet
    assert(got.toSet == expected)
    // the report-once rule must fully replace DISTINCT: a pair meeting in
    // several buckets appears exactly once
    assert(got.size == got.toSet.size,
      s"${got.size - got.toSet.size} duplicate pairs emitted")
  }

  test("boundary points match inclusively on both ends") {
    val p = Seq((1L, 100L, 1L), (1L, 200L, 2L), (1L, 99L, 3L), (1L, 201L, 4L))
      .toDF("k", "t", "pid")
    val iv = Seq((1L, 100L, 200L, 1L)).toDF("k", "start", "end", "iid")
    val hits = RangeJoin.intervalJoin(p, iv, "k", "t", "start", "end", 64L)
      .select("pid").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
  }
}
