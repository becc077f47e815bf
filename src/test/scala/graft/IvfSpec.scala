package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.sim.Ivf
import graft.sources.Tables

/** IVF-ANN correctness: deterministic training, exact scores on candidates,
  * full-cell coverage, and recall above the scanned-fraction floor on the
  * (worst-case: fully random) test embeddings. */
class IvfSpec extends AnyFunSuite {
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

  test("training is deterministic and every vector lands in a cell") {
    val c1 = Ivf.trainCentroids(emb, k = 16, iters = 3)
    val c2 = Ivf.trainCentroids(emb, k = 16, iters = 3)
    assert(c1.length == 16 && c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    val idx = Ivf.index(emb, c1)
    assert(idx.count() == emb.count())
    assert(idx.groupBy("cell").count().count() > 1, "degenerate quantizer: one cell")
  }

  test("training works on sparse/non-dense ids (hash-rank seeds)") {
    // Remap ids to a sparse, irregular space: stride-based seeding would
    // find no ids divisible by its stride here; hash-rank seeding must not
    // care. Same vectors → same k, deterministic across runs.
    val sparse = emb.select(
      (col("vec_id") * 1000003L + 17L).as("vec_id"), col("embedding"))
    val c1 = Ivf.trainCentroids(sparse, k = 16, iters = 2)
    val c2 = Ivf.trainCentroids(sparse, k = 16, iters = 2)
    assert(c1.length == 16 && c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    val books = graft.sim.Pq.trainCodebooks(sparse, k = 8, iters = 1)
    assert(books.length == graft.sim.Pq.NumSubspaces &&
      books.forall(_.length == 8))
  }

  test("IVF scores are exact cosines") {
    val exactAll = bruteTopK(499)
    Ivf.topKApprox(emb, emb.where(col("vec_id") < 20), k = 10)
      .collect().foreach { r =>
        val pair = (r.getLong(0), r.getLong(2))
        assert(math.abs(exactAll(pair) - r.getDouble(3)) < 1e-9,
          s"IVF score for $pair diverges from exact cosine")
      }
  }

  test("nprobe recall@10 beats the scanned-fraction floor") {
    val exact = bruteTopK(10).keySet
    val ivf = Ivf.topKApprox(emb, emb.where(col("vec_id") < 20), k = 10,
      numCells = 16, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // nprobe=6 of 16 cells scans ~37% of a random corpus; the quantizer
    // must concentrate true neighbors above that floor.
    assert(recall > 0.45, s"recall@10 = $recall")
  }

  test("recallSweep fails fast on an empty probe batch") {
    // hits/(k*nq) would be 0/0 → BigDecimal(NaN) throws deep in the sweep;
    // the guard names the real cause instead.
    val e = intercept[IllegalArgumentException] {
      Ivf.recallSweep(emb, emb.where(lit(false)), k = 5, nprobes = Seq(1, 2))
    }
    assert(e.getMessage.contains("empty probe batch"))
  }

  test("recallSweepOracleSql brute-force CTE tracks the queryPred parameter") {
    val sql = Ivf.recallSweepOracleSql(k = 5, nprobes = Seq(1, 2),
      queryPred = "id % 7 = 3")
    assert(!sql.contains("q.vec_id < 20"),
      "bf CTE still hardcodes the default probe predicate")
    assert(sql.contains("WHERE q.vec_id IN (SELECT id FROM v WHERE id % 7 = 3)"))
  }
}
