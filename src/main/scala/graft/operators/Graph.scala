package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph centrality for corpus curation. A web-scale training
  * corpus carries an implicit graph (pages link pages, users touch
  * suppliers, documents share sources), and link-structure centrality is a
  * standard document-quality prior — the classic PageRank signal
  * (Brin & Page, "The anatomy of a large-scale hypertextual Web search
  * engine", WWW 1998 — public methodology).
  *
  * Determinism: ranks are FIXED-POINT BIGINTs (caller-chosen scale), every
  * step is integer multiply / integer divide / integer sum — all exactly
  * associative — so the result is bit-identical across partitionings,
  * engines, and runs, and a SQL oracle can replay the iterations as
  * chained CTEs (the same replay trick the IVF training oracle uses).
  * Float PageRank cannot be hash-checked cross-engine: IEEE summation
  * order differs per shuffle.
  */
object Graph {
  /** Default fixed-point scale: 1.0 of rank = 10^12. Headroom rule: the
    * damping multiply bounds intermediates by 85 × N × scale, so callers
    * at N nodes need scale ≤ Long.MaxValue / (100 × N) — at the default,
    * safe past 10^5 nodes; a 10^9-node crawl graph wants scale = 10^6,
    * which still carries 6 decimal digits of rank resolution. */
  val DefaultScale = 1000000000000L

  /** Damped PageRank over an edge multigraph, `iters` synchronous
    * iterations from a uniform start (rank 1.0 per node):
    *
    *   rank'(v) = 0.15 + 0.85 · Σ_{(u,v) ∈ E} rank(u) / outdeg(u)
    *
    * in fixed-point: `(15·scale) div 100 + (85 · Σ (rank div outdeg)) div
    * 100`. Parallel edges act as weights (each row one unit). Nodes with
    * no out-edges leak their damped mass (no dangling redistribution) —
    * deterministic, and moot for symmetrized graphs where every node has
    * an out-edge.
    *
    * 100 TB posture: each iteration is one equi-join of the edge relation
    * against the rank relation plus one groupBy on the destination —
    * O(edges) per round, the textbook synchronous formulation. The edge ×
    * outdeg relation is computed once and persisted across iterations;
    * rank lineage is truncated per round (`localCheckpoint`) so the plan
    * stays constant-size — the same iterative-algorithm hazard rule as
    * [[graft.dedup.Dedup.connectedComponents]]. Nothing is collected to
    * the driver.
    *
    * @param edges (src: long, dst: long) rows; parallel rows = weight
    * @param iters fixed iteration count (fixed, not convergence-probed, so
    *              an oracle can replay exactly the same number of steps)
    * @return (node: long, rank: long) — rank in fixed-point `scale` units
    */
  def pageRank(
      edges: DataFrame, iters: Int = 5, scale: Long = DefaultScale): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    // one relation joined every round: pre-attach the out-degree
    val ed = e.join(outdeg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = (15L * scale) / 100L
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val contribs = ed.join(ranks, ed("src") === ranks("node"))
        .select(ed("dst").as("node"), expr("rank DIV od").as("c"))
        .groupBy("node").agg(sum(col("c")).as("insum"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"85 * coalesce(insum, 0L) DIV 100")).as("rank"))
        .localCheckpoint(true)
    }
    ed.unpersist(false)
    nodes.unpersist(false)
    ranks
  }
}
