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
}
