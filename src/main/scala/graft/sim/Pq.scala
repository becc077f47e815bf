package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorOps

/** Product quantization (PQ) for approximate nearest-neighbor search — the
  * memory-compression alternative to cell pruning ([[Ivf]]): each vector is
  * split into [[NumSubspaces]] contiguous sub-vectors and every sub-vector
  * is replaced by the id of its nearest codeword from a per-subspace
  * codebook trained with k-means. A 64-float vector becomes
  * [[NumSubspaces]] small ints, and a query is scored against a candidate
  * by summing per-subspace dot products with the candidate's CODEWORDS —
  * asymmetric distance computation (ADC): the query side stays exact, only
  * the corpus side is quantized (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public literature).
  *
  * The 100 TB shape: training reduces to M·k·subdim doubles on the driver
  * (tiny — and needs only a sample of the corpus, like [[Ivf]] training);
  * encoding is one scan-side projection per vector (M argmaxes over
  * literal codewords, all codegen'd); the stored index is 8 bytes/vector
  * instead of 256 — the whole point: a 100 TB float corpus becomes a ~3 TB
  * code table that fits hot storage for exhaustive ADC scans. Scoring a
  * query batch is a broadcast of the (tiny) batch against the code scan —
  * linear in the corpus per batch, the declared PQ-Flat baseline; compose
  * with [[Ivf]] cells (IVF-PQ) when even the linear code scan is too much.
  * With literal codebooks the per-subspace "table lookup" fuses into
  * whole-stage codegen as an 8-float dot against a constant — the classic
  * per-query lookup table materializes implicitly, at codegen constant-fold
  * time, not as a join.
  *
  * Everything is deterministic (hash-rank init — the k smallest md5(id)
  * vectors, density-free — fixed iterations, means
  * quantized to [[Ivf.MeanScale]] decimals), so the DuckDB oracle replays
  * training, encoding and ADC scoring end-to-end — the same guarantee
  * [[Ivf.topKOracleSql]] gives for the coarse quantizer.
  */
object Pq {
  /** M sub-quantizers over contiguous slices of the embedding. */
  val NumSubspaces = 8
  val SubDim: Int = CosineLsh.Dim / NumSubspaces
  /** Codewords per subspace. 8 keeps the fixture's codebooks honest
    * (500 vectors / 8 cells ≈ 62 per cell); production uses 256 (one byte
    * per subspace) — the math is identical. */
  val CodebookSize = 8
  val Iters = 2

  /** 1-based slice of subspace `m` from a (double-cast) vector column. */
  def subVector(v: Column, m: Int): Column = slice(v, m * SubDim + 1, SubDim)

  /** Deterministic per-subspace k-means, all subspaces trained in the SAME
    * corpus scans: seeds are hash-rank-sampled full vectors sliced into each
    * subspace; each Lloyd round assigns all M cells in one projection and
    * averages per (subspace, cell, coordinate) in one aggregate — one scan
    * per iteration TOTAL, not per subspace. Returns books(m)(cell)(coord),
    * means quantized to [[Ivf.MeanScale]] decimals (what lets the oracle
    * replay training bit-for-bit). Empty cells keep their codeword. */
  def trainCodebooks(
      emb: DataFrame, k: Int = CodebookSize, iters: Int = Iters,
      idCol: String = "vec_id", embCol: String = "embedding"): Array[Array[Array[Double]]] =
    // no-op unless a bench worker armed the memo; training is
    // deterministic, so the memoized value is the value (TrainingMemo)
    TrainingMemo.memo("pq.codebooks", emb, s"$k|$iters|$idCol|$embCol") {
      trainCodebooksImpl(emb, k, iters, idCol, embCol)
    }

  private def trainCodebooksImpl(
      emb: DataFrame, k: Int, iters: Int,
      idCol: String, embCol: String): Array[Array[Array[Double]]] = {
    val v = emb.select(col(idCol).as("id"), col(embCol).cast("array<double>").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      v.count() // materialize the cache before the training jobs
      // Hash-rank seed sampling (see Ivf.trainCentroids): density-free and
      // deterministic — the k vectors with the smallest md5(id).
      val seeds: Array[Array[Double]] = v
        .orderBy(md5(col("id").cast("string")), col("id")).limit(k)
        .select("v").collect().map(_.getSeq[Double](0).toArray)
      require(seeds.length == k,
        s"pq init: got ${seeds.length} seeds for k=$k (corpus smaller than k?)")
      var books: Array[Array[Array[Double]]] =
        Array.tabulate(NumSubspaces)(m =>
          seeds.map(_.slice(m * SubDim, (m + 1) * SubDim)))

      for (_ <- 1 to iters) {
        // Explode ONE struct per subspace (8/row, argmax evaluated inside
        // the generator so it runs exactly once per row — a per-coordinate
        // explode invites Catalyst to collapse the assignment above the
        // Generate and recompute all 64 dots per coordinate; measured
        // 4.5 s/round on 5k vectors vs ~0.3 s for this shape), then one
        // avg per sub-coordinate. Values are identical:
        // round(avg(sub[j]), MeanScale).
        val subs = array((0 until NumSubspaces).map { m =>
          struct(lit(m).as("m"),
            Ivf.cellCol(subVector(col("v"), m), books(m)).as("cell"),
            subVector(col("v"), m).as("sub"))
        }: _*)
        val means = v
          .select(explode(subs).as("s"))
          .select(col("s.m").as("m"), col("s.cell").as("cell"), col("s.sub").as("sub"))
          .groupBy("m", "cell")
          .agg(round(avg(element_at(col("sub"), 1)), Ivf.MeanScale).as("p0"),
            (1 until SubDim).map(j =>
              round(avg(element_at(col("sub"), j + 1)), Ivf.MeanScale).as(s"p$j")): _*)
          .collect()
        val byCell: Map[(Int, Int), Array[Double]] = means
          .map(r => (r.getInt(0), r.getInt(1)) ->
            (2 until 2 + SubDim).map(r.getDouble).toArray)
          .toMap
        books = Array.tabulate(NumSubspaces)(m =>
          books(m).indices.map(c => byCell.getOrElse((m, c), books(m)(c))).toArray)
      }
      books
    } finally v.unpersist(false)
  }

  /** Corpus encoded as one small int per subspace: a scan-side projection
    * (M argmaxes over literal codewords — the index write at scale). */
  def encode(corpus: DataFrame, books: Array[Array[Array[Double]]],
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val v = col(embCol).cast("array<double>")
    corpus.select(col(idCol).as("c_id"),
      array((0 until NumSubspaces).map(m =>
        Ivf.cellCol(subVector(v, m), books(m))): _*).as("codes"))
  }

  /** ADC score of an exact query vector against a candidate's codes:
    * per-subspace dot of the query slice with the candidate's codeword,
    * summed left-to-right (the oracle mirrors the same association). */
  def adcScore(qEmb: Column, codes: Column, books: Array[Array[Array[Double]]]): Column = {
    val qv = qEmb.cast("array<double>")
    (0 until NumSubspaces).map { m =>
      val book = typedLit(books(m).map(_.toSeq).toSeq)
      VectorOps.dot(subVector(qv, m),
        element_at(book, element_at(codes, m + 1) + 1))
    }.reduce(_ + _)
  }

  /** Approximate top-k by inner product (MIPS-style ADC ranking): encode
    * the corpus, broadcast the query batch, score codes linearly, window
    * per query. The declared PQ-Flat baseline — candidate volume is
    * O(corpus) per batch by design, never O(n²). */
  def topKApprox(
      corpus: DataFrame, queries: DataFrame, k: Int,
      books: Array[Array[Array[Double]]]): DataFrame = {
    val codes = encode(corpus, books)
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_score").desc, col("c_id"))
    codes.join(broadcast(q), col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(adcScore(col("q_emb"), col("codes"), books), 6).as("approx_score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "approx_score")
      .orderBy("q_id", "rnk")
  }

  /** Per-subspace codebook oracle fragments — hash-rank seeds sliced per
    * subspace, Lloyd rounds unrolled, and the final code assignment
    * `${px}s{m}_code(id, cell)` with codewords in `${px}s{m}_c{iters}` and
    * query slices in `${px}s{m}_v` — everything downstream of a `v(id, v)`
    * CTE the caller provides. `px` prefixes every CTE name so the chain
    * composes with the coarse-quantizer chain ([[Ivf.coarseCtes]]). */
  def codebookCtes(
      k: Int = CodebookSize, iters: Int = Iters, px: String = "",
      src: String = "v"): String = {
    def score(vc: String) =
      s"list_dot_product($vc, c.cv) - list_dot_product(c.cv, c.cv)/2.0"
    def lo(m: Int) = m * SubDim + 1
    def hi(m: Int) = (m + 1) * SubDim
    val perSub = (0 until NumSubspaces).map { m =>
      val p = s"${px}s$m"
      val lloyd = (1 to iters).map { i =>
        s"""
      ${p}_a$i AS (
        SELECT id, v, cell FROM (
          SELECT a.id, a.v, c.cell,
                 row_number() OVER (PARTITION BY a.id
                   ORDER BY ${score("a.v")} DESC, c.cell DESC) AS rn
          FROM ${p}_v a CROSS JOIN ${p}_c${i - 1} c) WHERE rn = 1),
      ${p}_m$i AS (
        SELECT cell, list(m ORDER BY pos) AS cv FROM (
          SELECT cell, pos, round(avg(v[CAST(pos AS INT)]), ${Ivf.MeanScale}) AS m
          FROM (SELECT cell, v, unnest(generate_series(1, $SubDim)) AS pos
                FROM ${p}_a$i)
          GROUP BY cell, pos) GROUP BY cell),
      ${p}_c$i AS (
        SELECT p.cell, coalesce(m.cv, p.cv) AS cv
        FROM ${p}_c${i - 1} p LEFT JOIN ${p}_m$i m USING (cell)),"""
      }.mkString
      s"""
      ${p}_v AS (SELECT id, v[${lo(m)}:${hi(m)}] AS v FROM $src),
      ${p}_c0 AS (SELECT cell, v[${lo(m)}:${hi(m)}] AS cv FROM ${px}seeds),
      $lloyd
      ${p}_code AS (
        SELECT id, cell FROM (
          SELECT a.id, c.cell,
                 row_number() OVER (PARTITION BY a.id
                   ORDER BY ${score("a.v")} DESC, c.cell DESC) AS rn
          FROM ${p}_v a CROSS JOIN ${p}_c$iters c) WHERE rn = 1)"""
    }.mkString(",")
    s"""
      ${px}seeds AS (
        SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1
                 AS cell, v
        FROM (SELECT id, v FROM $src
              ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $k)),
      $perSub"""
  }

  /** The ADC scoring joins and left-associated dot sum over the
    * [[codebookCtes]] relations, for a candidate alias exposing
    * `q_id`/`c_id`. Query slices always come from the RAW `v` CTE — with
    * residual codebooks ([[IvfPq.topKResidual]]) the `${px}s{m}_v` slices
    * hold residuals, and ADC keeps the query side exact by definition. */
  private[sim] def adcJoinsSql(iters: Int, px: String = ""): (String, String) = {
    val joins = (0 until NumSubspaces).map { m =>
      val (lo, hi) = (m * SubDim + 1, (m + 1) * SubDim)
      s"""JOIN ${px}s${m}_code k$m ON k$m.id = c_id
        JOIN ${px}s${m}_c$iters b$m ON b$m.cell = k$m.cell
        JOIN (SELECT id, v[$lo:$hi] AS v FROM v) q$m ON q$m.id = q_id"""
    }.mkString("\n        ")
    val dotSum = (0 until NumSubspaces)
      .map(m => s"list_dot_product(q$m.v, b$m.cv)").mkString(" + ")
    (joins, dotSum)
  }

  /** DuckDB oracle mirroring train → encode → ADC-rank END-TO-END: the
    * per-subspace Lloyd rounds are unrolled as chained CTEs (same hash-rank
    * seeds sliced per subspace, same argmax assignment with ties toward
    * the larger cell, same [[Ivf.MeanScale]]-quantized means, same
    * empty-cell carry-over), then the same code assignment and the same
    * left-associated sum of per-subspace dots. */
  def topKOracleSql(
      k: Int = CodebookSize, iters: Int = Iters, topK: Int = 3,
      queryPred: String = "id < 10"): String = {
    val (codeJoins, dotSum) = adcJoinsSql(iters)
    s"""
      WITH v AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${codebookCtes(k, iters)},
      cand AS (
        SELECT q.id AS q_id, t.id AS c_id
        FROM v q JOIN v t ON t.id <> q.id
        WHERE q.$queryPred),
      scored AS (
        SELECT q_id, c_id, round($dotSum, 6) AS approx_score
        FROM cand
        $codeJoins),
      ranked AS (
        SELECT q_id, c_id, approx_score,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY approx_score DESC, c_id) AS rnk
        FROM scored)
      SELECT q_id, rnk, c_id, approx_score FROM ranked
      WHERE rnk <= $topK ORDER BY q_id, rnk"""
  }
}
