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

  test("result is invariant to input partitioning") {
    val df = spark.read.parquet(TestSpark.sf("sf0.001") + "/lineitem.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Skyline.skyline2d(d, "l_extendedprice", "l_quantity")
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(run(df.repartition(1)) == run(df.repartition(17)))
  }
}
