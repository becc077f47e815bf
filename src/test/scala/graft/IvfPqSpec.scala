package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.sim.{Ivf, IvfPq, Pq}
import graft.sources.Tables

/** IVF-PQ composition: pruning actually prunes (every returned candidate
  * sits in one of its query's probed cells), ranking tracks the exact
  * inner product above chance, and the two stages agree with their
  * standalone counterparts' training. */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.load(spark, TestSpark.sf("sf0.001"), "embeddings")

  test("every returned candidate lies in a probed cell of its query") {
    val centroids = Ivf.trainCentroids(emb, k = 16, iters = 5)
    val result = IvfPq.topKApprox(emb, emb.where(col("vec_id") < 10), k = 10)
    val cells = Ivf.index(emb, centroids).select(col("c_id"), col("cell"))
    val probes = Ivf.probeCells(
      emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      centroids, nprobe = 4).select(col("q_id"), col("probe"))
    val escaped = result.join(cells, "c_id")
      .join(probes, Seq("q_id"), "left_semi")
      .join(probes,
        result("q_id") === probes("q_id") && col("cell") === probes("probe"),
        "left_anti")
    assert(escaped.count() == 0, "candidate outside its query's probed cells")
  }

  /** Exact inner-product top-k pairs for queries vec_id < 20. */
  private def bruteTopK(k: Int): Set[(Long, Long)] = {
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
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("recall@10 vs exact inner product beats chance at the pruned volume") {
    val exact = bruteTopK(10)
    val got = IvfPq.topKApprox(emb, emb.where(col("vec_id") < 20), k = 10,
      nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // chance recall@10 over 499 candidates is ~0.02; nprobe=6/16 scans
    // ~37% of a uniform corpus and the ADC ranking sits on top of that —
    // the composition must still clear chance by a wide margin.
    assert(recall > 0.1, s"recall@10 = $recall")
  }

  test("re-ranked results use exact cosines over the ADC shortlist only") {
    val rr = IvfPq.topKReranked(emb, emb.where(col("vec_id") < 10),
      k = 3, shortlist = 10).persist()
    // training is deterministic, so recomputing the shortlist reproduces it
    val shortlist = IvfPq.topKApprox(emb, emb.where(col("vec_id") < 10), k = 10)
      .select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = rr.select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(shortlist), "re-rank invented a candidate")
    // and the reported scores are EXACT cosines, not ADC approximations
    val cv = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val qv = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wrong = rr.join(cv, "c_id").join(qv, "q_id")
      .where(col("score") =!= VectorOps.cosineRounded(col("c_emb"), col("q_emb")))
      .count()
    rr.unpersist()
    assert(wrong == 0, s"$wrong re-ranked scores diverge from exact cosine")
  }

  test("residual IVFADC keeps the pruning invariant and beats chance") {
    val centroids = Ivf.trainCentroids(emb, k = 16, iters = 5)
    val rr = IvfPq.topKResidual(emb, emb.where(col("vec_id") < 20), k = 10,
      nprobe = 6).persist()
    // pruning invariant: candidates only from probed cells
    val cells = Ivf.index(emb, centroids).select(col("c_id"), col("cell"))
    val probes = Ivf.probeCells(
      emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      centroids, nprobe = 6).select(col("q_id"), col("probe"))
    val escaped = rr.join(cells, "c_id")
      .join(probes,
        rr("q_id") === probes("q_id") && col("cell") === probes("probe"),
        "left_anti")
    assert(escaped.count() == 0, "candidate outside its query's probed cells")
    // recall: same bar as the raw-vector composition
    val exact = bruteTopK(10)
    val got = rr.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    rr.unpersist()
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall > 0.1, s"recall@10 = $recall")
  }

  test("composed index row carries the same codes PQ assigns standalone") {
    val books = Pq.trainCodebooks(emb)
    val standalone = Pq.encode(emb, books)
    val centroids = Ivf.trainCentroids(emb, k = 16, iters = 5)
    val v = col("embedding").cast("array<double>")
    val composed = emb.select(col("vec_id").as("c_id"),
      array((0 until Pq.NumSubspaces).map(m =>
        Ivf.cellCol(Pq.subVector(v, m), books(m))): _*).as("codes2"))
    val diff = standalone.join(composed, "c_id")
      .where(col("codes") =!= col("codes2")).count()
    assert(diff == 0, s"$diff vectors encode differently in the composition")
  }
}
