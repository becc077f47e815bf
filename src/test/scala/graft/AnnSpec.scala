package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.sim.Ann
import graft.sources.Tables

/** ANN correctness: returned scores are true cosines, results are a subset
  * of the exact ranking, and multiprobe recall clears a floor on the
  * (worst-case: fully random) test embeddings. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.load(spark, TestSpark.sf("sf0.001"), "embeddings")

  private def bruteTopK(k: Int): Map[(Long, Long), Double] = {
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    c.join(broadcast(q), col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        VectorOps.cosineRounded(col("c_emb"), col("q_emb")).as("score"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("ANN scores are exact cosines and a subset of the candidate space") {
    val ann = Ann.topKApprox(emb, emb.where(col("vec_id") < 20), k = 10,
      numPlanes = 6, probeRadius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exactAll = bruteTopK(499) // every pair's true score
    ann.foreach { case (pair, score) =>
      assert(math.abs(exactAll(pair) - score) < 1e-9,
        s"ANN score for $pair diverges from exact cosine")
    }
  }

  test("multiprobe recall@10 beats the random-candidate floor") {
    val exact = bruteTopK(10).keySet
    val ann = Ann.topKApprox(emb, emb.where(col("vec_id") < 20), k = 10,
      numPlanes = 6, probeRadius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // 6 planes, radius 2 => 22 of 64 buckets probed (~34% of a *random*
    // corpus); LSH must concentrate true neighbors above that floor.
    assert(recall > 0.40, s"recall@10 = $recall")
  }

  test("single-probe candidate volume is a small fraction of the corpus") {
    val planes = Ann.hyperplanes(6, 64)
    val idx = Ann.index(emb, planes)
    val biggestBucket = idx.groupBy("bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(biggestBucket < emb.count() / 4,
      "buckets are degenerate - hashing is not spreading the corpus")
  }

  private def bruteTopKDot(k: Int): Map[(Long, Long), Double] = {
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    c.join(broadcast(q), col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(VectorOps.dot(col("c_emb"), col("q_emb")), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("MIPS scores are exact inner products; augmented recall clears the floor") {
    val mips = Ann.topKMips(emb, emb.where(col("vec_id") < 20), k = 10,
      numPlanes = 6, probeRadius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exactAll = bruteTopKDot(499)
    mips.foreach { case (pair, score) =>
      assert(math.abs(exactAll(pair) - score) < 1e-9,
        s"MIPS score for $pair diverges from the exact inner product")
    }
    val exact = bruteTopKDot(10).keySet
    val recall = (exact & mips.keySet).size.toDouble / exact.size
    assert(recall > 0.40, s"MIPS recall@10 = $recall")
  }

  test("MIPS ranking is by inner product, not cosine") {
    // the fixture's random vectors have near-uniform norms (so dot and
    // cosine orders coincide) — inject a norm signal: scale each vector
    // by 1 + vec_id % 5. Now the orders MUST disagree somewhere, and
    // topKMips must follow the dot order, not the cosine one.
    val scaled = emb.select(col("vec_id"),
      expr("transform(embedding, x -> x * (1.0 + vec_id % 5))")
        .cast("array<float>").as("embedding"))
    import org.apache.spark.sql.expressions.Window
    def top1(score: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): Map[Long, Long] = {
      val q = scaled.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = scaled.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
      c.join(broadcast(q), col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"),
          score(col("c_emb"), col("q_emb")).as("score"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val byDot = top1((c, q) => round(VectorOps.dot(c, q), 6))
    val byCos = top1((c, q) => VectorOps.cosineRounded(c, q))
    assert(byDot != byCos,
      "top-1 by dot and by cosine agree on every probe despite injected norm skew")
    // high-radius MIPS probe: returned top-1 must equal the exact DOT
    // top-1 wherever the probe surfaced it, never the cosine top-1
    val mips = Ann.topKMips(scaled, scaled.where(col("vec_id") < 20), k = 1,
      numPlanes = 6, probeRadius = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val followed = mips.count { case (qId, cId) => byDot(qId) == cId }
    val betrayed = mips.count { case (qId, cId) =>
      byDot(qId) != cId && byCos(qId) == cId }
    assert(followed > betrayed,
      s"MIPS tracked the cosine order ($betrayed probes) over the dot order ($followed)")
  }

  test("MMR guards degenerate inputs: no candidates fails fast, short corpus caps k") {
    import graft.sim.Mmr
    // corpus that holds ONLY the query row: no candidates to rank
    val solo = emb.where(col("vec_id") === 0L)
    val e = intercept[IllegalArgumentException] {
      Mmr.select(solo, queryId = 0L, n = 5, k = 3, lambda = 0.7)
    }
    assert(e.getMessage.contains("no candidates"))
    // absent query id fails with the cause, not a NoSuchElementException
    val e2 = intercept[IllegalArgumentException] {
      Mmr.select(emb.where(col("vec_id") < 5), queryId = 999L, n = 3, k = 2, lambda = 0.7)
    }
    assert(e2.getMessage.contains("not found"))
    // 3 candidates but k = 5: selects all 3 instead of throwing mid-loop
    val tiny = emb.where(col("vec_id") < 4)
    val picks = Mmr.select(tiny, queryId = 0L, n = 5, k = 5, lambda = 0.7)
    assert(picks.length == 3 && picks.map(_.step) == Seq(1, 2, 3))
    assert(picks.map(_.id).toSet == Set(1L, 2L, 3L))
  }
}
