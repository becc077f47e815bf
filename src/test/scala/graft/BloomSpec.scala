package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin
import graft.sources.Tables

/** Bloom join pruning: no false negatives (pruned join == plain join),
  * real pruning (the fact scan shrinks), deterministic bits, and sane
  * false-positive behavior. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val sf = TestSpark.sf("sf0.001")
  private lazy val li = Tables.load(spark, sf, "lineitem")
  private lazy val urgent = Tables.load(spark, sf, "orders")
    .where(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey")

  test("pruned join result equals the plain join result") {
    val pruned = BloomJoin.pruneFact(li, "l_orderkey", urgent, "o_orderkey")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
    assert(pruned.except(plain).count() == 0 && plain.except(pruned).count() == 0)
  }

  test("the filter actually prunes the fact side") {
    val total = li.count()
    val matching = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val passed = BloomJoin.pruneFact(li, "l_orderkey", urgent, "o_orderkey").count()
    assert(passed >= matching, "false negatives: bloom dropped matching rows")
    // ~10 bits/key, k=3 → fp ≈ 1%; allow generous slack over exact matches
    assert(passed <= matching + (total - matching) / 10,
      s"bloom passed $passed of $total (exact matches: $matching) — no real pruning")
    assert(passed < total, "bloom passed everything")
  }

  test("bit table build is deterministic and distributed math matches driver math") {
    val keys = urgent
    val n = keys.count()
    val bits1 = BloomJoin.buildBits(keys, "o_orderkey", BloomJoin.sizeFor(n))
    val bits2 = BloomJoin.buildBits(keys, "o_orderkey", BloomJoin.sizeFor(n))
    assert(bits1.sameElements(bits2), "non-deterministic bloom build")
    assert(bits1.exists(_ != 0L), "empty bit table for non-empty keys")
  }

  test("an empty dimension side rejects every probe") {
    val none = urgent.where(lit(false))
    val bits = BloomJoin.buildBits(none, "o_orderkey", 64 * 8)
    val passed = li.where(BloomJoin.mightContain(col("l_orderkey"), bits)).count()
    assert(passed == 0L)
  }

  test("probe stays inside whole-stage codegen on the scan") {
    val n = urgent.count()
    val bits = BloomJoin.buildBits(urgent, "o_orderkey", BloomJoin.sizeFor(n))
    val df = li.where(BloomJoin.mightContain(col("l_orderkey"), bits))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"bloom probe fell out of codegen:\n$plan")
  }
}
