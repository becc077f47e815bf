package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Top principal component by deterministic power iteration — the spectral
  * primitive an embedding pipeline uses for whitening, OPQ-style rotation
  * pre-processing, and drift monitoring (projecting batches onto the
  * dominant variance direction turns "did the embedding distribution
  * move?" into a scalar time series).
  *
  * The 100 TB shape mirrors [[Ivf.trainCentroids]]: each power-iteration
  * round is ONE scan — score s_i = (x_i − µ)·u as a codegen'd vec_dot
  * projection, then a single 1×dim aggregate Σ s_i·(x_i − µ) — and the
  * only driver-side state is dim-sized (µ, u). No covariance matrix is
  * ever materialized (dim² would be fine; n·dim² per round would not).
  *
  * Determinism contract (what lets DuckDB replay training bit-for-bit,
  * same rationale as [[Ivf.MeanScale]]): µ and each round's normalized u
  * are quantized to 6 decimals — float-sum order differences (~1e-12
  * relative) vanish against the 1e-6 quantum — and the final projections
  * round to 6. Init u₀ = 1/√dim·(1,…,1), fixed iteration count, no RNG.
  */
object Pca {

  val Scale = 6

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(Scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (µ, u): quantized coordinate means and the quantized unit top
    * eigenvector after `iters` power rounds. One scan per round; the
    * vector relation feeds iters+1 jobs, so persist upstream if the
    * source is expensive (the registry query reads a cached parquet). */
  def trainTopComponent(
      emb: DataFrame, iters: Int = 5,
      embCol: String = "embedding"): (Array[Double], Array[Double]) = {
    val v = emb.select(col(embCol).cast("array<double>").as("v"))
    val dim = v.head().getSeq[Double](0).length
    val mu: Array[Double] = v
      .agg(round(avg(element_at(col("v"), 1)), Scale).as("m0"),
        (1 until dim).map(i =>
          round(avg(element_at(col("v"), i + 1)), Scale).as(s"m$i")): _*)
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    var u = Array.fill(dim)(round6(1.0 / math.sqrt(dim.toDouble)))
    for (_ <- 1 to iters) {
      // s = (v − µ)·u via the centered-dot identity v·u − µ·u (one
      // vec_dot per row, no per-row array rebuild); w_j = Σ s·(v_j − µ_j)
      val muDotU = mu.zip(u).map { case (a, b) => a * b }.sum
      val s = (VectorOps.dot(col("v"), lit(u)) - lit(muDotU)).as("s")
      val w: Array[Double] = v.select(col("v"), s)
        .agg(sum(expr("s * (v[0] - " + mu(0) + ")")).as("w0"),
          (1 until dim).map(i =>
            sum(expr(s"s * (v[$i] - ${mu(i)})")).as(s"w$i")): _*)
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      val n = math.sqrt(w.map(x => x * x).sum)
      u = w.map(x => round6(x / n))
    }
    (mu, u)
  }

  /** Per-vector projection onto the trained component:
    * round((x − µ)·u, 6) = round(x·u − µ·u, 6). */
  def project(emb: DataFrame, iters: Int = 5,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val (mu, u) = trainTopComponent(emb, iters, embCol)
    val muDotU = mu.zip(u).map { case (a, b) => a * b }.sum
    emb.select(col(idCol),
      round(VectorOps.dot(col(embCol).cast("array<double>"), lit(u))
        - lit(muDotU), Scale).as("pc1_proj"))
      .orderBy(idCol)
  }

  /** The training replay as a WITH-body prefix ending in `u$iters` —
    * shared by the projection oracle and the variance-ratio oracle so the
    * replayed eigenvector can never diverge between them. */
  def oracleCtes(iters: Int = 5, dim: Int = 64): String = {
    val rounds = (1 to iters).map { i =>
      s"""
      s$i AS (
        SELECT e.id,
               list_dot_product(e.v, u.uv)
                 - list_dot_product(m.mv, u.uv) AS s
        FROM v e, mu m, u${i - 1} u),
      w$i AS (
        SELECT list(w ORDER BY pos) AS wv FROM (
          SELECT pos, sum(s.s * (e.v[CAST(pos AS INT)]
                                 - m.mv[CAST(pos AS INT)])) AS w
          FROM v e JOIN s$i s ON s.id = e.id, mu m,
               (SELECT unnest(generate_series(1, $dim)) AS pos) p
          GROUP BY pos)),
      u$i AS (
        SELECT list_transform(wv, x ->
          round(x / sqrt(list_dot_product(wv, wv)), ${Scale})) AS uv
        FROM w$i)${if (i == iters) "" else ","}"""
    }.mkString
    s"""
      v AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
      mu AS (
        SELECT list(m ORDER BY pos) AS mv FROM (
          SELECT pos, round(avg(v[CAST(pos AS INT)]), ${Scale}) AS m
          FROM (SELECT v, unnest(generate_series(1, $dim)) AS pos FROM v)
          GROUP BY pos)),
      u0 AS (
        SELECT list_transform(generate_series(1, $dim), x ->
          round(1.0 / sqrt($dim), ${Scale})) AS uv),
      $rounds"""
  }

  /** DuckDB oracle replaying [[project]] END-TO-END: the same µ
    * quantization, the same u₀, the `iters` power rounds unrolled as CTEs
    * (per-round: score per vector, per-coordinate weighted sums, L2
    * normalize, quantize), then the same rounded projection. */
  def projectOracleSql(iters: Int = 5, dim: Int = 64): String =
    s"""
      WITH ${oracleCtes(iters, dim)},
      proj AS (
        SELECT e.id AS vec_id,
               round(list_dot_product(e.v, u.uv)
                     - list_dot_product(m.mv, u.uv), ${Scale}) AS pc1_proj
        FROM v e, mu m, u$iters u)
      SELECT vec_id, pc1_proj FROM proj ORDER BY vec_id"""

  /** All-but-the-top correction readout (Mu & Viswanath, ICLR'18 "All-
    * but-the-Top: Simple and Effective Postprocessing for Word
    * Representations" — public methodology): embedding spaces concentrate
    * mass on a few common directions; removing the top component(s)
    * restores isotropy and improves similarity tasks. This reports the
    * top-k vectors MOST dominated by the common direction — projection
    * s = (v−µ)·u against what survives removal, the residual norm
    * √(|v−µ|² − s²) — the before/after view of the correction. One scan;
    * every term derives from the quantized µ/u via fixed-order dot
    * products, so the rounded output hash-matches the oracle replay. */
  def abttResidual(emb: DataFrame, iters: Int = 5, k: Int = 20,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val (mu, u) = trainTopComponent(emb, iters, embCol)
    val muDotU = mu.zip(u).map { case (a, b) => a * b }.sum
    val mu2 = mu.map(x => x * x).sum
    val v = col(embCol).cast("array<double>")
    val s = VectorOps.dot(v, lit(u)) - lit(muDotU)
    val c2 = VectorOps.dot(v, v) - lit(2.0) * VectorOps.dot(v, lit(mu)) + lit(mu2)
    emb.select(col(idCol),
        round(s, Scale).as("pc1_proj"),
        round(sqrt(greatest(c2 - s * s, lit(0.0))), Scale).as("resid_norm"))
      .orderBy(abs(col("pc1_proj")).desc, col(idCol))
      .limit(k)
  }

  /** DuckDB oracle for [[abttResidual]]: the shared training replay plus
    * the same fixed-order projection/residual arithmetic. */
  def abttResidualOracleSql(iters: Int = 5, dim: Int = 64, k: Int = 20): String =
    s"""
      WITH ${oracleCtes(iters, dim)},
      r AS (
        SELECT e.id AS vec_id,
               round(list_dot_product(e.v, u.uv)
                     - list_dot_product(m.mv, u.uv), ${Scale}) AS pc1_proj,
               round(sqrt(greatest(
                 (list_dot_product(e.v, e.v)
                    - 2.0 * list_dot_product(e.v, m.mv)
                    + list_dot_product(m.mv, m.mv))
                 - (list_dot_product(e.v, u.uv) - list_dot_product(m.mv, u.uv))
                   * (list_dot_product(e.v, u.uv) - list_dot_product(m.mv, u.uv)),
                 0.0)), ${Scale}) AS resid_norm
        FROM v e, mu m, u$iters u)
      SELECT vec_id, pc1_proj, resid_norm FROM r
      ORDER BY abs(pc1_proj) DESC, vec_id LIMIT $k"""

  /** Explained-variance ratio of the trained top component:
    * Var(s)/Σ_j Var(v_j) with s = (v−µ)·u, total variance via the
    * identity Σ_j Var(v_j) = E[|v|²] − |µ|². Moment scalars are pulled
    * to the driver (same style as training). Determinism: per-row terms
    * are rounded to 6dp and accumulated in DECIMAL(18,6) — an exact,
    * order-independent sum (the repo-wide pattern: events_decayed_counts,
    * text_zipf_fit) — then divided driver-side as doubles; a raw-double
    * avg() would make the 6dp hash partition-order-dependent. The same
    * arithmetic, term for term, in [[varianceRatioOracleSql]]. */
  def varianceRatio(emb: DataFrame, iters: Int = 5,
      embCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val (mu, u) = trainTopComponent(emb, iters, embCol)
    val muDotU = mu.zip(u).map { case (a, b) => a * b }.sum
    val v = emb.select(col(embCol).cast("array<double>").as("v"))
    val dec = org.apache.spark.sql.types.DecimalType(18, Scale)
    val sdf = v.select((VectorOps.dot(col("v"), lit(u)) - lit(muDotU)).as("sc"),
      VectorOps.dot(col("v"), col("v")).as("vv"))
    val st = sdf.agg(
      sum(round(col("sc"), Scale).cast(dec)).as("s1"),
      sum(round(col("sc") * col("sc"), Scale).cast(dec)).as("s2"),
      sum(round(col("vv"), Scale).cast(dec)).as("sv"),
      count(lit(1)).as("n")).head()
    val n = st.getLong(3).toDouble
    val ms = round6(st.getDecimal(0).doubleValue() / n)
    val ms2 = round6(st.getDecimal(1).doubleValue() / n)
    val e2 = round6(st.getDecimal(2).doubleValue() / n)
    val mu2 = mu.map(x => x * x).sum
    val varPc1 = ms2 - ms * ms
    val varTotal = e2 - mu2
    spark.range(1).select(
      lit(round6(varPc1)).as("var_pc1"),
      lit(round6(varTotal)).as("var_total"),
      lit(round6(varPc1 / varTotal)).as("ratio"))
  }

  /** DuckDB oracle for [[varianceRatio]]: the shared training replay plus
    * the same rounded moment arithmetic. */
  def varianceRatioOracleSql(iters: Int = 5, dim: Int = 64): String =
    s"""
      WITH ${oracleCtes(iters, dim)},
      sc AS (
        SELECT list_dot_product(e.v, u.uv)
                 - list_dot_product(m.mv, u.uv) AS sc
        FROM v e, mu m, u$iters u),
      st AS (
        SELECT round(CAST(sum(CAST(round(sc, ${Scale}) AS DECIMAL(18,${Scale}))) AS DOUBLE)
                     / count(*), ${Scale}) AS ms,
               round(CAST(sum(CAST(round(sc * sc, ${Scale}) AS DECIMAL(18,${Scale}))) AS DOUBLE)
                     / count(*), ${Scale}) AS ms2
        FROM sc),
      tv AS (
        SELECT round(CAST(sum(CAST(round(list_dot_product(v, v), ${Scale})
                                   AS DECIMAL(18,${Scale}))) AS DOUBLE)
                     / count(*), ${Scale}) AS e2 FROM v),
      mm AS (SELECT list_dot_product(mv, mv) AS mu2 FROM mu)
      SELECT round(ms2 - ms * ms, ${Scale}) AS var_pc1,
             round(e2 - mu2, ${Scale}) AS var_total,
             round((ms2 - ms * ms) / (e2 - mu2), ${Scale}) AS ratio
      FROM st, tv, mm"""
}
