package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Pca

/** Power-iteration quality: the oracle proves both engines train the same
  * component; these tests prove the component is the RIGHT one. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("power iteration recovers a planted dominant direction") {
    import spark.implicits._
    val dim = 16
    val d = Array.tabulate(dim)(i => if (i % 2 == 0) 0.6 else -0.2)
    val dn = { val n = math.sqrt(d.map(x => x * x).sum); d.map(_ / n) }
    // spread along d dominates; deterministic integer "noise" is ~10x
    // smaller so the top eigenvector must align with the plant
    val rows = (0 until 200).map { i =>
      val t = ((i % 21) - 10).toDouble
      val vec = Array.tabulate(dim)(j =>
        (t * dn(j) + 0.05 * (((i * 31 + j * 17) % 13) - 6)).toFloat)
      (i.toLong, vec)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (_, u) = Pca.trainTopComponent(df, iters = 8)
    val cos = u.zip(dn).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.98,
      s"|cos(trained, planted)| = ${math.abs(cos)} — power iteration missed")
  }

  test("projections are mean-centered up to the quantization budget") {
    val emb = spark.read.parquet(TestSpark.sf("sf0.001") + "/embeddings.parquet")
    GraftSession.tune(spark)
    val s = Pca.project(emb).agg(sum(col("pc1_proj"))).head().getDouble(0)
    // mu rounds to 1e-6 per coordinate and each projection to 1e-6: over
    // 500 rows x 64 dims the worst-case drift stays well under 0.01
    assert(math.abs(s) < 0.01, s"projection sum $s is not centered")
  }
}
