package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

/** Skyline correctness as a property: nothing in the skyline is dominated,
  * everything outside it is, and the result is independent of input
  * partitioning (local skylines are an optimization, not a semantic). */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dominates(a: (Double, Double), b: (Double, Double)): Boolean =
    a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)

  test("skyline is exactly the non-dominated distinct point set") {
    val rnd = new scala.util.Random(31)
    val pts = (1 to 2000).map(_ => (rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    val df = pts.toDF("price", "qty")
    val sky = Skyline.skyline2d(df, "price", "qty")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val distinct = pts.toSet
    val expected = distinct.filterNot(p => distinct.exists(q => dominates(q, p)))
    assert(sky == expected)
  }

  test("anti-correlated data (every point on the front) stays exact") {
    // Worst case for any gather-based merge: nothing is dominated (for
    // min-price/max-qty, points where BOTH dims increase together are
    // mutually incomparable), so all n local survivors reach the global
    // stage. The parallel merge must return every point — and not funnel
    // them through one partition.
    val n = 5000
    val pts = (1 to n).map(i => (i.toDouble, i.toDouble))
    val sky = Skyline.skyline2d(pts.toDF("price", "qty"), "price", "qty")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(sky == pts.toSet)
  }

  test("duplicate-mn columns keep only the best mx across partitions") {
    // equal mn values must land in ONE range partition; a tie broken
    // across partitions would let a dominated point survive the cut
    val pts = Seq((1.0, 5.0), (1.0, 9.0), (2.0, 9.0), (2.0, 1.0), (3.0, 10.0))
    val sky = Skyline.skyline2d(
      pts.toDF("price", "qty").repartition(7), "price", "qty")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(sky == Set((1.0, 9.0), (3.0, 10.0)))
  }

  test("result is invariant to input partitioning") {
    val df = spark.read.parquet(TestSpark.sf("sf0.001") + "/lineitem.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Skyline.skyline2d(d, "l_extendedprice", "l_quantity")
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(run(df.repartition(1)) == run(df.repartition(17)))
  }
}
