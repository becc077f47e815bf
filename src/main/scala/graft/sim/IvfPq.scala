package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the composition of the two ANN scale paths — [[Ivf]] coarse
  * cells PRUNE the candidate set (only `nprobe/numCells` of the corpus is
  * touched per query) and [[Pq]] codes COMPRESS what remains (candidates
  * are ranked by ADC against 8-byte codes, never their floats). This is
  * the architecture every billion-vector index runs in production
  * (Jégou et al. 2011's IVFADC); at 100 TB the index is the corpus
  * partitioned by cell with a code column, queries route to their probed
  * partitions, and the float vectors are only ever read again for an
  * optional exact re-rank of the final short list.
  *
  * Both trainings are deterministic, so the DuckDB oracle replays the
  * whole thing: coarse Lloyd rounds, per-subspace codebook Lloyd rounds,
  * cell routing, code assignment and the ADC ranking, end-to-end.
  * [[topKResidual]] is the paper's full IVFADC: PQ codebooks trained on
  * the RESIDUAL v − centroid(cell), which tightens ADC error for
  * clustered data; [[topKReranked]] adds the exact re-rank stage.
  */
object IvfPq {

  /** Approximate top-k: one scan-side projection builds the (cell, codes)
    * index row per vector; probed-cell equi-join prunes; ADC ranks. */
  def topKApprox(
      corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int = 16, nprobe: Int = 4, coarseIters: Int = 5): DataFrame = {
    val centroids = Ivf.trainCentroids(corpus, numCells, coarseIters)
    val books = Pq.trainCodebooks(corpus)
    val v = col("embedding").cast("array<double>")
    val idx = corpus.select(col("vec_id").as("c_id"),
      Ivf.cellCol(v, centroids).as("cell"),
      array((0 until Pq.NumSubspaces).map(m =>
        Ivf.cellCol(Pq.subVector(v, m), books(m))): _*).as("codes"))
    val q = Ivf.probeCells(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      centroids, nprobe)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_score").desc, col("c_id"))
    idx.join(q, col("cell") === col("probe") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(Pq.adcScore(col("q_emb"), col("codes"), books), 6).as("approx_score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "approx_score")
      .orderBy("q_id", "rnk")
  }

  /** The refinement stage production stacks put on top: take the ADC
    * shortlist (`shortlist` per query) and re-rank it by EXACT cosine —
    * the float vectors are read again only for shortlist rows (a tiny
    * broadcast-semi of the corpus scan), which is the whole economics of
    * IVF-PQ: approximate math over everything, exact math over almost
    * nothing. */
  def topKReranked(
      corpus: DataFrame, queries: DataFrame, k: Int, shortlist: Int = 10,
      numCells: Int = 16, nprobe: Int = 4, coarseIters: Int = 5): DataFrame = {
    import graft.functions.VectorOps
    val sl = topKApprox(corpus, queries, shortlist, numCells, nprobe, coarseIters)
      .select("q_id", "c_id")
    val cv = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val qv = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    cv.join(broadcast(sl), "c_id")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("c_id"),
        VectorOps.cosineRounded(col("c_emb"), col("q_emb")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
      .orderBy("q_id", "rnk")
  }

  /** Residual IVF-PQ — IVFADC exactly as in Jégou et al. 2011: the PQ
    * codebooks are trained on RESIDUALS `v − centroid(cell)` and a
    * candidate's approximate score is
    * `dot(q, centroid(cell)) + Σₘ dot(qₘ, codewordₘ(residual))`. For
    * clustered data the residuals have far less variance than the raw
    * vectors, so the same 8-byte budget buys a much tighter ADC error;
    * structurally everything else matches [[topKApprox]] — and both
    * trainings still replay in the oracle. */
  def topKResidual(
      corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int = 16, nprobe: Int = 4, coarseIters: Int = 5): DataFrame = {
    import graft.functions.VectorOps
    val centroids = Ivf.trainCentroids(corpus, numCells, coarseIters)
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val v = col("embedding").cast("array<double>")
    // residual relation: one scan-side projection (cell argmax + zip_with
    // subtraction against the literal centroid table)
    val resid = corpus.select(col("vec_id"),
      Ivf.cellCol(v, centroids).as("cell"),
      zip_with(v, element_at(cLit, col("cell") + 1), (a, b) => a - b).as("rv"))
    val books = Pq.trainCodebooks(resid, embCol = "rv")
    val idx = resid.select(col("vec_id").as("c_id"), col("cell"),
      array((0 until Pq.NumSubspaces).map(m =>
        Ivf.cellCol(Pq.subVector(col("rv"), m), books(m))): _*).as("codes"))
    val q = Ivf.probeCells(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      centroids, nprobe)
    val qv = col("q_emb").cast("array<double>")
    // centroid term first, then the 8 residual-codeword dots, summed
    // left-to-right — the oracle mirrors the same association
    val score = (VectorOps.dot(qv, element_at(cLit, col("cell") + 1)) +:
      (0 until Pq.NumSubspaces).map { m =>
        val book = typedLit(books(m).map(_.toSeq).toSeq)
        VectorOps.dot(Pq.subVector(qv, m),
          element_at(book, element_at(col("codes"), m + 1) + 1))
      }).reduce(_ + _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_score").desc, col("c_id"))
    idx.join(q, col("cell") === col("probe") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"), round(score, 6).as("approx_score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "approx_score")
      .orderBy("q_id", "rnk")
  }

  /** DuckDB oracle for [[topKResidual]]: coarse chain, residual CTE
    * (`v − centroid(cell)` against the trained centroids), codebook chain
    * over the residuals, then the centroid-plus-codewords ADC sum. */
  def residualOracleSql(
      numCells: Int = 16, nprobe: Int = 4, topK: Int = 3,
      coarseIters: Int = 5, dim: Int = 64, queryPred: String = "id < 10"): String = {
    val (codeJoins, dotSum) = Pq.adcJoinsSql(Pq.Iters, "pq_")
    // v and rv are MATERIALIZED: the codebook chain references them many
    // times and DuckDB's default CTE inlining would otherwise re-open the
    // parquet once per reference (observed fd exhaustion at this depth)
    s"""
      WITH v AS MATERIALIZED (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${Ivf.coarseCtes(numCells, nprobe, coarseIters, dim, queryPred, "ivf_")},
      rv AS MATERIALIZED (
        SELECT i.c_id AS id, i.cell,
               list_transform(range(1, ${dim + 1}),
                 j -> a.v[CAST(j AS INT)] - c.cv[CAST(j AS INT)]) AS v
        FROM ivf_idx i
        JOIN v a ON a.id = i.c_id
        JOIN ivf_c$coarseIters c ON c.cell = i.cell),
      ${Pq.codebookCtes(Pq.CodebookSize, Pq.Iters, "pq_", src = "rv")},
      cand AS (
        SELECT p.q_id, i.c_id, i.cell
        FROM ivf_probes p JOIN ivf_idx i
          ON i.cell = p.probe AND i.c_id <> p.q_id),
      scored AS (
        SELECT q_id, c_id,
               round(list_dot_product(qv.v, cc.cv) + $dotSum, 6)
                 AS approx_score
        FROM cand
        JOIN v qv ON qv.id = q_id
        JOIN ivf_c$coarseIters cc ON cc.cell = cand.cell
        $codeJoins),
      ranked AS (
        SELECT q_id, c_id, approx_score,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY approx_score DESC, c_id) AS rnk
        FROM scored)
      SELECT q_id, rnk, c_id, approx_score FROM ranked
      WHERE rnk <= $topK ORDER BY q_id, rnk"""
  }

  /** Shared WITH-body: route, encode, ADC-score, rank. Ends at
    * `ranked(q_id, c_id, approx_score, rnk)`. */
  private def rankedCtes(
      numCells: Int, nprobe: Int, coarseIters: Int, dim: Int,
      queryPred: String): String = {
    val (codeJoins, dotSum) = Pq.adcJoinsSql(Pq.Iters, "pq_")
    s"""v AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${Ivf.coarseCtes(numCells, nprobe, coarseIters, dim, queryPred, "ivf_")},
      ${Pq.codebookCtes(Pq.CodebookSize, Pq.Iters, "pq_")},
      cand AS (
        SELECT p.q_id, i.c_id
        FROM ivf_probes p JOIN ivf_idx i
          ON i.cell = p.probe AND i.c_id <> p.q_id),
      scored AS (
        SELECT q_id, c_id, round($dotSum, 6) AS approx_score
        FROM cand
        $codeJoins),
      ranked AS (
        SELECT q_id, c_id, approx_score,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY approx_score DESC, c_id) AS rnk
        FROM scored)"""
  }

  /** DuckDB oracle: the [[Ivf.coarseCtes]] chain (prefixed `ivf_`) routes
    * and probes, the [[Pq.codebookCtes]] chain (prefixed `pq_`) encodes,
    * and the ADC sum ranks the pruned candidates — train → route → encode
    * → rank replayed end-to-end. */
  def topKOracleSql(
      numCells: Int = 16, nprobe: Int = 4, topK: Int = 3,
      coarseIters: Int = 5, dim: Int = 64, queryPred: String = "id < 10"): String =
    s"""
      WITH ${rankedCtes(numCells, nprobe, coarseIters, dim, queryPred)}
      SELECT q_id, rnk, c_id, approx_score FROM ranked
      WHERE rnk <= $topK ORDER BY q_id, rnk"""

  /** DuckDB oracle for [[topKReranked]]: same chain, then the exact-cosine
    * re-rank of the ADC shortlist. */
  def rerankedOracleSql(
      topK: Int = 3, shortlist: Int = 10,
      numCells: Int = 16, nprobe: Int = 4,
      coarseIters: Int = 5, dim: Int = 64, queryPred: String = "id < 10"): String = {
    val cos = graft.functions.VectorOps.cosineSql("eq.embedding", "ec.embedding")
    s"""
      WITH ${rankedCtes(numCells, nprobe, coarseIters, dim, queryPred)},
      rr AS (
        SELECT r.q_id, r.c_id, round($cos, 6) AS score
        FROM ranked r
        JOIN embeddings eq ON eq.vec_id = r.q_id
        JOIN embeddings ec ON ec.vec_id = r.c_id
        WHERE r.rnk <= $shortlist),
      rr2 AS (
        SELECT q_id, c_id, score,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY score DESC, c_id) AS rnk
        FROM rr)
      SELECT q_id, rnk, c_id, score FROM rr2
      WHERE rnk <= $topK ORDER BY q_id, rnk"""
  }
}
