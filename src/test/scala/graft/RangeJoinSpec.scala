package graft

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

  test("boundary points match inclusively on both ends") {
    val p = Seq((1L, 100L, 1L), (1L, 200L, 2L), (1L, 99L, 3L), (1L, 201L, 4L))
      .toDF("k", "t", "pid")
    val iv = Seq((1L, 100L, 200L, 1L)).toDF("k", "start", "end", "iid")
    val hits = RangeJoin.intervalJoin(p, iv, "k", "t", "start", "end", 64L)
      .select("pid").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
  }
}
