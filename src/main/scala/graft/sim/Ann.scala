package graft.sim

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate nearest-neighbor search: sign-random-projection LSH over an
  * `array<float>` embedding column.
  *
  * The 100 TB shape: bucket the corpus ONCE by `numPlanes` hyperplane sign
  * bits (a linear scan producing a small int key), write it partitioned/
  * bucketed by that key, then answer queries by joining only against the
  * probed buckets (the query's bucket plus all buckets within Hamming
  * distance `probeRadius`). Candidate volume is corpus/2^planes per probe —
  * the brute-force O(N·Q) cross join never happens.
  *
  * Hyperplanes are ±1 Rademacher vectors from a fixed seed, so the index is
  * reproducible across runs and engines; dot products against them use the
  * same fold as VectorOps (codegen'd higher-order functions, no UDF).
  */
object Ann {

  /** Deterministic ±1 hyperplanes: `numPlanes` x `dim`. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(numPlanes, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Bucket id column: bit h = sign(v · plane_h). Plane dots go through
    * the native codegen'd vec_dot (VectorOps.dot); one hash pass over the
    * corpus is `numPlanes` tight scalar loops per row, no HOF dispatch. */
  def bucketCol(emb: Column, planes: Array[Array[Double]]): Column = {
    val v = emb.cast("array<double>")
    planes.zipWithIndex.map { case (p, h) =>
      when(VectorOps.dot(v, lit(p)) >= 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** All bucket ids within Hamming distance <= radius of each vector's own
    * bucket (multi-probe): the query-side expansion. */
  def probeBuckets(bucket: Column, numPlanes: Int, radius: Int): Column = {
    require(radius >= 0 && radius <= 2, "probeRadius 0..2 supported")
    val flips: Seq[Column] = Seq(bucket) ++
      (if (radius >= 1) (0 until numPlanes).map(h => bucket.bitwiseXOR(lit(1L << h)))
       else Nil) ++
      (if (radius >= 2)
         for { i <- 0 until numPlanes; j <- (i + 1) until numPlanes }
           yield bucket.bitwiseXOR(lit((1L << i) | (1L << j)))
       else Nil)
    array(flips: _*)
  }

  /** Corpus indexed by bucket. At scale: persist this partitioned by
    * `bucket` (or bucketed via `bucketBy`) and reuse across query batches. */
  def index(corpus: DataFrame, planes: Array[Array[Double]],
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"),
      bucketCol(col(embCol), planes).as("bucket"))

  /** Approximate top-k: probe-bucket join + per-query top-k window.
    * Exact cosine is computed only on candidates that share a probed
    * bucket. */
  def topKApprox(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      probeRadius: Int = 1,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val idx = index(corpus, planes)
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("probe",
        explode(probeBuckets(bucketCol(col("q_emb"), planes), numPlanes, probeRadius)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    idx.join(q, col("bucket") === col("probe") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        VectorOps.cosineRounded(col("c_emb"), col("q_emb")).as("score"))
      .distinct() // a candidate can match several probes
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
      .orderBy("q_id", "rnk")
  }

  /** Maximum-inner-product top-k via the norm-augmentation reduction
    * (Bachrach et al., RecSys'14; Shrivastava & Li, NIPS'14): append a
    * coordinate sqrt(M² − |x|²) to every corpus vector (M = max corpus
    * norm) and 0 to every query — inner-product order over the originals
    * equals cosine order over the augmented space, so the SAME sign-LSH
    * bucketing serves MIPS. This is retrieval's native score (user·item
    * recommenders, un-normalized embedding search) where cosine LSH is
    * simply wrong. The augmented coordinate never materializes: bucket
    * bits fold it into the plane dot scan-side, queries hash with the
    * first `dim` plane coords (their extra coordinate is 0), and the
    * exact verify on candidates scores the RAW inner product. M² is one
    * max aggregate pulled to the driver (threshold-pull pattern). */
  def topKMips(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      probeRadius: Int = 1,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim + 1, seed)
    val m2 = corpus
      .agg(max(VectorOps.dot(col("embedding"), col("embedding"))))
      .head.getDouble(0)
    def augBucket(emb: Column): Column = {
      val v = emb.cast("array<double>")
      planes.zipWithIndex.map { case (p, h) =>
        val d = VectorOps.dot(v, lit(p.take(dim))) +
          lit(p(dim)) * sqrt(greatest(lit(0.0), lit(m2) - VectorOps.dot(v, v)))
        when(d >= 0, lit(1L << h)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val idx = corpus.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), augBucket(col("embedding")).as("bucket"))
    val qPlanes = planes.map(_.take(dim))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("probe", explode(
        probeBuckets(bucketCol(col("q_emb"), qPlanes), numPlanes, probeRadius)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    idx.join(q, col("bucket") === col("probe") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(VectorOps.dot(col("c_emb"), col("q_emb")), 6).as("score"))
      .distinct() // a candidate can match several probes
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
      .orderBy("q_id", "rnk")
  }
}
