package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** IVF (inverted-file) approximate nearest-neighbor search — the coarse-
  * quantizer alternative to sign-LSH ([[Ann]]): k-means partitions the
  * corpus into `k` cells; a query scans only its `nprobe` nearest cells.
  *
  * The 100 TB shape: training touches the corpus `iters` times but reduces
  * to k·dim doubles on the driver (tiny); assignment is one scan-side
  * projection (argmax over k dot products through the native `vec_dot`);
  * the index is the corpus written partitioned/bucketed by `cell`; a query
  * batch joins only against its probed cells — candidate volume is
  * ~`nprobe/k` of the corpus per query, and the all-pairs cross join never
  * happens. Everything is deterministic: stride-sampled init, fixed
  * iteration count, no RNG.
  *
  * Cell assignment minimizes L2 distance via the monotone form
  * `argmax(v·c − |c|²/2)` — one dot product per centroid, no per-row
  * norm of `v` needed.
  */
object Ivf {

  /** Argmax cell id for a vector against literal centroids: a `greatest`
    * over (score, cell) structs — struct ordering compares score first,
    * so ties break toward the larger cell id, deterministically. */
  def cellCol(v: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val half = c.map(x => x * x).sum / 2.0
      struct((VectorOps.dot(v, lit(c)) - lit(half)).as("s"), lit(i).as("c"))
    }
    greatest(scored.toIndexedSeq: _*).getField("c")
  }

  /** Deterministic Lloyd training: stride-sampled init over `idCol` order,
    * `iters` assign/average rounds; empty cells keep their centroid. */
  def trainCentroids(
      emb: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", embCol: String = "embedding"): Array[Array[Double]] = {
    val v = emb.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("v"))
    val n = v.count()
    val stride = math.max(n / k, 1L)
    // Stride-filter on the id VALUE (no global row_number — a single-task
    // sort over the corpus would bottleneck at scale); ids are dense in
    // the fixtures, and any deterministic spread works as k-means init.
    var centroids: Array[Array[Double]] = v
      .where(pmod(col("id"), lit(stride)) === 0)
      .orderBy("id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(centroids.length == k,
      s"ivf init: got ${centroids.length} seeds for k=$k (ids not dense?)")

    for (_ <- 1 to iters) {
      val assigned = v.withColumn("cell", cellCol(col("v"), centroids))
      val means: Map[Int, Array[Double]] = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Corpus indexed by cell. At scale: persist partitioned/bucketed by
    * `cell` and reuse across query batches. */
  def index(corpus: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"),
      cellCol(col(embCol).cast("array<double>"), centroids).as("cell"))

  /** The query's `nprobe` nearest cells, as an exploded (q_id, probe)
    * relation: scores against all k centroids, sort desc, slice. */
  private def probeCells(
      queries: DataFrame, centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val half = c.map(x => x * x).sum / 2.0
      struct((VectorOps.dot(col("q_emb").cast("array<double>"), lit(c)) - lit(half)).as("s"),
        lit(i).as("c"))
    }
    queries
      .withColumn("ranked", sort_array(array(scored.toIndexedSeq: _*), asc = false))
      .withColumn("probe", explode(slice(col("ranked"), 1, nprobe)))
      .select(col("q_id"), col("q_emb"), col("probe.c").as("probe"))
  }

  /** Approximate top-k by cosine: probe-cell join + per-query window.
    * Exact cosine only on candidates in probed cells. */
  def topKApprox(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numCells: Int = 16,
      nprobe: Int = 4,
      iters: Int = 5): DataFrame = {
    val centroids = trainCentroids(corpus, numCells, iters)
    val idx = index(corpus, centroids)
    val q = probeCells(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      centroids, nprobe)
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    idx.join(q, col("cell") === col("probe") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        VectorOps.cosineRounded(col("c_emb"), col("q_emb")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
      .orderBy("q_id", "rnk")
  }
}
