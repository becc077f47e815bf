package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

/** Salted aggregation equals the plain aggregation and actually spreads a
  * pathological key across salt sub-groups. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val li = Tables.load(spark, TestSpark.sf("sf0.001"), "lineitem")

  test("salted agg equals plain agg on count/sum/min/max") {
    val plain = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"), sum("l_quantity").as("sq"),
      min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), Seq(
      Skew.CountRows("n"), Skew.Sum("l_quantity", "sq"),
      Skew.Min("l_extendedprice", "mn"), Skew.Max("l_extendedprice", "mx")))
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("salted join equals the plain join, duplicates and all-hot keys included") {
    import spark.implicits._
    // worst case: ONE key holds every big-side row, and the small side
    // carries duplicate key rows (each must match every big row once per
    // occurrence, exactly like the plain join)
    val big = (1 to 5000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val small = Seq(("hot", "a"), ("hot", "b"), ("cold", "c")).toDF("k", "tag")
    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
    // and the salt genuinely spread the hot key's rows
    val spread = big
      .withColumn("__salt", pmod(hash($"v"), lit(8)))
      .groupBy("__salt").count().count()
    assert(spread == 8, s"salt spread only $spread of 8 sub-groups")
  }

  test("a 100%-skewed key spreads across many salt sub-groups") {
    import spark.implicits._
    // one key carries every row — the worst case for a hash partitioner
    val skewed = (1 to 10000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val subGroups = skewed
      .withColumn("__salt", pmod(hash($"v"), lit(64)))
      .groupBy("k", "__salt").count().count()
    assert(subGroups > 48, s"salt spread only $subGroups of 64 sub-groups")
    val r = Skew.saltedAgg(skewed, Seq("k"), Seq(
      Skew.CountRows("n"), Skew.Sum("v", "s")))
    val row = r.head()
    assert(row.getAs[Long]("n") == 10000L && row.getAs[Long]("s") == 50005000L)
  }
}
