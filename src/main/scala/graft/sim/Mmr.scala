package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Maximal Marginal Relevance diversified retrieval (Carbonell &
  * Goldstein, "The use of MMR, diversity-based reranking for reordering
  * documents and producing summaries", SIGIR 1998 — public methodology):
  * from the top-N most query-relevant candidates, greedily select k items
  * maximizing  λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)  — relevance traded
  * against redundancy with the already-selected set. The retrieval-time
  * twin of the k-center coreset: k-center diversifies with no query;
  * MMR diversifies AROUND one.
  *
  * 100 TB posture: candidate generation is the distributed part — one
  * corpus scan scoring rounded cosine against the driver-held query
  * vector, closed by a TakeOrdered top-N (the sim_topk_bruteforce plan;
  * swap in the IVF/LSH index probe for the indexed path). The greedy loop
  * then runs DRIVER-SIDE over the N pulled candidates (N × dim doubles —
  * bounded, k·N² cosine evaluations on ≤ tens of rows), never another
  * cluster job. Determinism: relevance and pairwise similarities round to
  * 6dp with ascending-id tie-breaks, every dot product folds in index
  * order — so a SQL oracle replays candidate selection AND all k greedy
  * rounds bit-exactly.
  */
object Mmr {
  /** One selected item: 1-based step, id, rounded query relevance, and
    * the rounded MMR score (None for the seed, which argmaxes pure
    * relevance). */
  final case class Pick(step: Int, id: Long, rel: Double, score: Option[Double])

  /** Index-order fold dot product — the driver mirror of [[VectorOps.dot]]
    * / DuckDB's `list_dot_product` on DOUBLE[]. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos6(a: Array[Double], b: Array[Double]): Double =
    round6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

  /** Run MMR for the query vector stored at `queryId`: top-`n` candidates
    * by rounded cosine (id tie-break), then k greedy rounds at trade-off
    * `lambda`. Returns the picks in selection order.
    *
    * Contract note: when the corpus holds FEWER than `k` candidates
    * besides the query row, the result has `min(k, candidates)` picks —
    * not exactly `k`. Callers that sized downstream logic on `k` must
    * check `result.size`; the shortfall is also logged to stderr so a
    * silent under-fill is visible in run output. */
  def select(emb: DataFrame, queryId: Long, n: Int, k: Int, lambda: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): Seq[Pick] = {
    require(n >= k && k >= 1, s"need n >= k >= 1, got n=$n k=$k")
    val qRows = emb.where(col(idCol) === queryId)
      .select(col(embCol).cast("array<double>"))
      .take(1)
    require(qRows.nonEmpty, s"query id $queryId not found in $idCol")
    val q = qRows.head.getSeq[Double](0).toArray
    val cand = emb.where(col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("id"),
        VectorOps.cosineRounded(col(embCol), lit(q)).as("rel"),
        col(embCol).cast("array<double>").as("v"))
      .orderBy(col("rel").desc, col("id"))
      .limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    // A corpus holding only the query row has nothing to rank; and fewer
    // than k candidates would exhaust the greedy loop's reduceLeft —
    // select as many as exist (kEff), never throw mid-loop.
    require(cand.nonEmpty, s"no candidates: corpus holds no rows besides query id $queryId")
    val kEff = math.min(k, cand.length)
    if (kEff < k)
      System.err.println(s"[mmr] corpus has only ${cand.length} candidates; returning $kEff picks instead of the requested $k")
    // seed: pure-relevance argmax = the first candidate (already ordered)
    var picks = Vector(Pick(1, cand.head._1, cand.head._2, None))
    var selVecs = Vector(cand.head._3)
    var selIds = Set(cand.head._1)
    for (step <- 2 to kEff) {
      val best = cand.iterator
        .filterNot { case (id, _, _) => selIds(id) }
        .map { case (id, rel, v) =>
          val maxSim = selVecs.map(s => cos6(v, s)).max
          (id, rel, v, round6(lambda * rel - (1.0 - lambda) * maxSim))
        }
        // argmax score, ascending-id tie-break
        .reduceLeft((a, b) =>
          if (b._4 > a._4 || (b._4 == a._4 && b._1 < a._1)) b else a)
      picks :+= Pick(step, best._1, best._2, Some(best._4))
      selVecs :+= best._3
      selIds += best._1
    }
    picks
  }

  /** DuckDB oracle replaying [[select]] end-to-end: rounded-cosine top-N
    * candidates, then the k greedy rounds unrolled as chained CTEs — the
    * same 6dp rounding points, greatest() over per-selected rounded sims,
    * and (score DESC, id) argmax. */
  def selectOracleSql(queryId: Long, n: Int, k: Int, lambda: Double): String = {
    val lam = lambda.toString
    val oneMinus = (1.0 - lambda).toString
    def cosTo(j: Int) = s"round(${VectorOps.cosineSql("c.v", s"s$j.v")}, 6)"
    val rounds = (2 to k).map { r =>
      val prev = (1 until r).map(j => s"s$j")
      val sims = (1 until r).map(cosTo)
      val maxSim = if (sims.size == 1) sims.head
        else s"greatest(${sims.mkString(", ")})"
      val notIn = (1 until r).map(j => s"c.id <> s$j.id").mkString(" AND ")
      s"""
      m$r AS (
        SELECT c.id, c.rel, c.v,
               round($lam * c.rel - $oneMinus * $maxSim, 6) AS score
        FROM cand c, ${prev.mkString(", ")}
        WHERE $notIn),
      s$r AS (SELECT id, rel, v, score FROM m$r
              ORDER BY score DESC, id LIMIT 1)"""
    }.mkString(",")
    val steps = (1 to k).map { r =>
      if (r == 1)
        "SELECT 1 AS step, id, rel, CAST(NULL AS DOUBLE) AS mmr_score FROM s1"
      else s"SELECT $r AS step, id, rel, score AS mmr_score FROM s$r"
    }.mkString(" UNION ALL ")
    s"""
      WITH v AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
      q AS (SELECT v FROM v WHERE id = $queryId),
      cand AS (
        SELECT c.id, round(${VectorOps.cosineSql("c.v", "q.v")}, 6) AS rel,
               c.v
        FROM v c, q WHERE c.id <> $queryId
        ORDER BY rel DESC, id LIMIT $n),
      s1 AS (SELECT id, rel, v FROM cand ORDER BY rel DESC, id LIMIT 1),$rounds
      SELECT CAST(step AS BIGINT) AS step, id AS vec_id, rel AS relevance,
             mmr_score
      FROM ($steps) ORDER BY step"""
  }
}
