package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.sim.Pq
import graft.sources.Tables

/** PQ-ANN correctness: deterministic training, complete in-range codes,
  * ADC scores that actually track the exact inner product, and recall
  * above chance on the (worst-case: fully random) test embeddings. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.load(spark, TestSpark.sf("sf0.001"), "embeddings")
  private lazy val books = Pq.trainCodebooks(emb)

  /** Exact inner-product top-k (the ranking ADC approximates). */
  private def bruteTopK(k: Int): Map[(Long, Long), Double] = {
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

  test("training is deterministic with the declared shape") {
    val b1 = Pq.trainCodebooks(emb)
    val b2 = Pq.trainCodebooks(emb)
    assert(b1.length == Pq.NumSubspaces)
    assert(b1.forall(_.length == Pq.CodebookSize))
    assert(b1.forall(_.forall(_.length == Pq.SubDim)))
    assert(b1.zip(b2).forall { case (ma, mb) =>
      ma.zip(mb).forall { case (a, b) => a.sameElements(b) }
    })
  }

  test("every vector gets a full in-range code word") {
    val codes = Pq.encode(emb, books).persist()
    assert(codes.count() == emb.count())
    val bad = codes.where(
      exists(col("codes"), c => c < 0 || c >= Pq.CodebookSize) ||
        size(col("codes")) =!= Pq.NumSubspaces)
    assert(bad.count() == 0, "out-of-range or short code words")
    // no subspace may collapse to one codeword on 500 vectors
    val perSub = codes.select(posexplode(col("codes")).as(Seq("m", "c")))
      .groupBy("m").agg(countDistinct("c").as("n"))
      .collect().map(r => r.getLong(1))
    codes.unpersist()
    assert(perSub.forall(_ > 1), s"degenerate subspace: ${perSub.mkString(",")}")
  }

  test("ADC error stays below the score spread it has to rank") {
    // For every (query, candidate) pair: |adc - exact dot| must stay below
    // the spread of exact dots — at error >= one spread sd the ranking
    // would be indistinguishable from noise. Uniform random vectors are
    // PQ's WORST case (no cluster structure for the codebooks to exploit;
    // measured rmse/spread ~0.82 here, vs <<1 on real clustered
    // embeddings); the recall test below is the end-to-end quality gate.
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val stats = Pq.encode(emb, books)
      .join(broadcast(q), col("c_id") =!= col("q_id"))
      .join(emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")), "c_id")
      .select(
        (Pq.adcScore(col("q_emb"), col("codes"), books)
          - VectorOps.dot(col("c_emb"), col("q_emb"))).as("err"),
        VectorOps.dot(col("c_emb"), col("q_emb")).as("exact"))
      .agg(sqrt(avg(col("err") * col("err"))).as("rmse"),
        stddev_pop(col("exact")).as("spread"))
      .head()
    val (rmse, spread) = (stats.getDouble(0), stats.getDouble(1))
    assert(rmse < spread, s"ADC rmse $rmse vs exact-dot spread $spread")
  }

  test("recall@10 beats chance by an order of magnitude") {
    val exact = bruteTopK(10).keySet
    val pq = Pq.topKApprox(emb, emb.where(col("vec_id") < 20), k = 10, books)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // chance recall@10 over 499 candidates is ~0.02; random 64-d vectors
    // are the hardest case for an 8x8 PQ, but it must still rank far
    // above chance. (0.15 ≈ 7x chance: the exact value shifts a few
    // hundredths with the seed sample — 0.20 under stride seeds, 0.18
    // under hash-rank seeds — so the gate sits below that noise band.)
    assert(recall > 0.15, s"recall@10 = $recall")
  }
}
