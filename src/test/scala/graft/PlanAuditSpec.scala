package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit over EVERY registered query: the shapes that kill a
  * 100 TB run must never appear, and scan-level optimizations must be
  * present where the query promises them. Runs at sf0.001 — plan shapes,
  * not data volume, are what's asserted. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf("sf0.001")

  // ---- registry-wide plan-size guard (round-9 lesson: graph_kcore) ----
  // Iterative queries that forget the localCheckpoint rule grow their
  // analyzed plan multiplicatively per round (kcore: ~5x/round — a 24 GB
  // driver heap to peel a 23k-edge graph). The blown-up plans live in
  // CONSTRUCTION-TIME actions (per-round count()s), not in the returned
  // DataFrame, so auditing `dfs` alone cannot see them; a
  // QueryExecutionListener sees the analyzed plan of EVERY action fired
  // while the registry is built and executed. Registered here, before the
  // lazy `dfs`/`plans` force anything.
  private val planNodeCap = 2000
  private val maxNodesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  private val worstPlanHead = new java.util.concurrent.atomic.AtomicReference[String]("")
  private val oversized = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val markerSeen = new java.util.concurrent.CountDownLatch(1)
  private val MarkerLit = 424242424201L
  spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
    private def record(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
      val a = qe.analyzed
      val n = a.collect { case p => p }.size
      if (n > maxNodesSeen.getAndUpdate(m => math.max(m, n))) {
        worstPlanHead.set(a.toString.linesIterator.take(5).mkString("\n"))
      }
      if (n > planNodeCap) oversized.add(s"${a.nodeName}... ($n nodes)")
      if (a.toString.contains(MarkerLit.toString)) markerSeen.countDown()
    }
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
      record(qe)
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
      record(qe)
  })

  // Build each registry DataFrame exactly once (construction itself runs
  // driver-side actions for threshold-pull queries) and share it between
  // the executed-plan strings and the logical-plan audits.
  private lazy val dfs: Map[String, org.apache.spark.sql.DataFrame] =
    SparkEntry.queries.map { case (name, fn) => name -> fn(spark, sf) }

  private lazy val plans: Map[String, String] =
    dfs.map { case (name, df) =>
      df.collect() // execute THIS dataframe so AQE finalizes its plan
      name -> df.queryExecution.executedPlan.toString
    }

  /** Declared linear-scan baselines: their O(N·Q) broadcast nested-loop is
    * the point (Q is tiny and broadcast) — exact float scan for the two
    * brute-force queries, 8-byte-code ADC scan for PQ-Flat (whose reason to
    * exist is making exactly this scan memory-bound cheap; compose with IVF
    * cells when even that is too much). The pruned scale paths are
    * sim_ann_lsh / sim_ann_ivf / CosineLsh. Nothing else may plan one. */
  private val intendedBruteForce =
    Set("sim_knn_join", "sim_topk_bruteforce", "sim_ann_pq",
      // declared-exact hard-negative mining: a broadcast probe BATCH
      // against the corpus scan — O(corpus x probes) by design, the
      // baseline the IVF/PQ indexes accelerate at larger probe counts
      "sim_hard_negatives",
      // recall evaluation NEEDS the exact reference ranking: its
      // brute-force side is the ground truth the IVF path is graded
      // against, over the same broadcast probe batch
      "sim_ann_recall",
      // the unordered group-pair list (type_a < type_b over DISTINCT
      // event types) is an inherently non-equi self-join of a
      // group-cardinality-sized relation — bounded by the number of
      // sketch groups, never by data volume; everything downstream of
      // it joins equi on the pair key
      "agg_kmv_intersect",
      // the isotonic minimax fit enumerates pooled-rate intervals over
      // the <=20-row BIN relation (a <= b, then a <= r <= b) — theta
      // joins bounded by bin count, never by data volume; the corpus
      // scan upstream is one equi-keyed aggregate
      "quality_isotonic")

  test("no query plans a cartesian product or nested-loop join") {
    val offenders = plans.filter { case (name, p) =>
      !intendedBruteForce(name) &&
        (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
    }
    assert(offenders.isEmpty,
      s"O(n^2) join shapes in: ${offenders.keys.mkString(", ")}")
  }

  test("TPC-H-shaped joins broadcast their dimension side") {
    Seq("q3_top_revenue", "q5_local_supplier", "join_semi", "join_anti",
      "q8_market_share", "q17_small_qty_revenue", "q19_disjunctive_revenue")
      .foreach { q =>
        assert(plans(q).contains("BroadcastHashJoin"),
          s"$q does not broadcast its dimension side:\n${plans(q)}")
      }
  }

  test("correlated-EXISTS TPC-H shapes plan semi/anti joins, not subqueries") {
    // q4: one semi; q21: a semi AND an anti, both keyed on l_orderkey
    assert(plans("q4_priority_count").contains("LeftSemi"),
      s"q4 did not plan a semi join:\n${plans("q4_priority_count")}")
    assert(plans("q21_waiting_supplier").contains("LeftSemi") &&
      plans("q21_waiting_supplier").contains("LeftAnti"),
      s"q21 did not plan semi+anti joins:\n${plans("q21_waiting_supplier")}")
  }

  test("selective scans push filters into the parquet reader") {
    // q3/q5 filter on market segment / region; the predicate must reach
    // PushedFilters, not sit in a post-scan Filter only.
    Seq("q3_top_revenue" -> "c_mktsegment", "q5_local_supplier" -> "r_name",
      "q6_forecast_revenue" -> "l_quantity")
      .foreach { case (q, col) =>
        val pushed = plans(q).linesIterator
          .filter(_.contains("PushedFilters"))
          .exists(l => l.toLowerCase.contains(col))
        assert(pushed, s"$q: filter on $col not pushed to parquet scan")
      }
  }

  test("single-table analytics stay in one whole-stage codegen pipeline") {
    Seq("text_stats", "text_quality", "text_langid", "text_fingerprint",
      "sample_stratified", "layout_zorder")
      .foreach { q =>
        // codegen stages print as `*(n) Op` in executedPlan.toString
        assert(plans(q).contains("*(1)"),
          s"$q fell out of whole-stage codegen:\n${plans(q)}")
      }
  }

  test("contamination check broadcasts the benchmark n-gram set") {
    // the 100 TB contract: the train corpus is never shuffled — the eval
    // side broadcasts into a hash join
    assert(plans("text_contamination").contains("BroadcastHashJoin"),
      s"text_contamination does not broadcast the eval side:\n${plans("text_contamination")}")
  }

  test("threshold-gated curation queries score the corpus text exactly once") {
    // quality_gate / curation_funnel pull a corpus-mean threshold to the
    // driver before filtering. The regex-heavy scoring projection is
    // persisted (narrow: ids + score) before that action, the final result
    // is materialized from it, and the scoring cache is then released —
    // so the returned plan reads a CACHED relation (InMemoryTableScan)
    // instead of re-scanning and re-scoring the documents text, which at
    // 100 TB would double the dominant cost.
    Seq("quality_gate", "curation_funnel").foreach { q =>
      assert(plans(q).contains("InMemoryTableScan"),
        s"$q re-scans the corpus instead of reading the cached scores:\n${plans(q)}")
    }
  }

  test("corpus_pmi runs each explode exactly once (normalizers from aggregates)") {
    // The O(tokens x window) pair explode is the dominant cost; the P/N
    // normalizers must come from the persisted aggregate relations, never
    // a second explode pass. With the aggregates cached, the RETURNED plan
    // joins InMemoryTableScans and EXECUTES no Generate at all — a
    // GenerateExec in the execution tree means an explode re-ran past its
    // cache (at 100 TB that second pass is the whole bill). The tree is
    // walked through AQE/stage wrappers; InMemoryTableScan leaves stop the
    // walk, so a cached relation's stored lineage (which legitimately
    // CONTAINS the one Generate that built it) does not count.
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def gens(p: SparkPlan): Int = {
      val self = p match { case _: GenerateExec => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(gens).sum
    }
    val p = plans("corpus_pmi") // forces execution so AQE's plan is final
    assert(p.contains("InMemoryTableScan"),
      s"corpus_pmi does not read its cached aggregates:\n$p")
    val n = gens(dfs("corpus_pmi").queryExecution.executedPlan)
    assert(n == 0, s"corpus_pmi executes $n Generate(s) past its caches:\n$p")
  }

  test("text_bm25 scores with a pure scan + bounded TakeOrdered — no shuffle") {
    // BM25's corpus stats (N, Σdl, per-term df) are pulled at construction
    // time; the returned plan must be scan-side arithmetic closed by a
    // TakeOrdered — an Exchange here would mean the scoring pass shuffles
    // the corpus, which at 100 TB is the whole bill.
    val p = plans("text_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"text_bm25 does not close with a bounded TakeOrdered:\n$p")
    assert(!p.contains("Exchange"),
      s"text_bm25 shuffles its scoring scan:\n$p")
  }

  test("text_entropy explodes the character stream exactly once") {
    // Per-char explode is ~|text| x row volume — the dominant cost. The
    // per-doc total n derives from a window over the per-char COUNTS
    // (distinct-chars-per-doc rows), never a second explode: exactly one
    // Generate in the executed tree.
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def gens(p: SparkPlan): Int = {
      val self = p match { case _: GenerateExec => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(gens).sum
    }
    plans("text_entropy") // force execution so AQE finalizes
    val n = gens(dfs("text_entropy").queryExecution.executedPlan)
    assert(n == 1, s"text_entropy executes $n Generate(s), expected exactly 1:\n${plans("text_entropy")}")
  }

  test("sample_dsir tokenizes the corpus exactly once (shared persisted scan)") {
    // The token explode feeds the target model, the raw model, AND the
    // scoring pass; all three must read the ONE persisted tokenized
    // relation. Same pin as corpus_pmi: the returned plan reads
    // InMemoryTableScans and executes no Generate of its own.
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def gens(p: SparkPlan): Int = {
      val self = p match { case _: GenerateExec => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(gens).sum
    }
    val p = plans("sample_dsir")
    assert(p.contains("InMemoryTableScan"),
      s"sample_dsir does not read its cached token relation:\n$p")
    val n = gens(dfs("sample_dsir").queryExecution.executedPlan)
    assert(n == 0, s"sample_dsir executes $n Generate(s) past its cache:\n$p")
  }

  test("every forced broadcast in the registry is bounded or declared") {
    // Forced broadcasts are where a plan OOMs at scale: a hint overrides
    // AQE's size check, so every `broadcast(...)` in the registry must be
    // provably bounded — anti-join drop lists, semi-join filters, inner
    // dimension joins alike (round-6 lesson: fact-slice hints looked fine
    // at sf0.1 and would have OOM'd a 1000-executor run). A hinted
    // relation is accepted iff one of:
    //   (1) every leaf under the hint is a true bounded dimension — the
    //       TPC-H dims, recognized by their s_/p_/n_/r_ column prefixes
    //       (covers filtered/joined derivations: part slices, ASIA
    //       suppliers, q16's negative-balance exclusion list);
    //   (2) every leaf is a LocalRelation — driver-materialized k-row
    //       relations (trained centroids/codebooks, probe literals);
    //   (3) the hinted subtree is an Aggregate or Limit (through unary
    //       wrappers): size = group cardinality / k, not input rows.
    //       Policy: a hinted Aggregate must group on a bounded key — the
    //       surviving ones are per-part (q17 lim), per-event-type,
    //       per-lang, per-cell, or global-scalar groups;
    //   (4) the query appears in `declaredHints` with its justification.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, GlobalLimit, LocalLimit, LocalRelation, LogicalPlan, ResolvedHint}
    val dimPrefixes = Seq("s_", "p_", "n_", "r_")
    // Whitelisted non-dim, non-aggregate hinted relations, each bounded by
    // construction rather than by plan shape:
    val declaredHints: Map[String, String] = Map(
      // ANN probe batches: embeddings filtered to a fixed probe-id set —
      // bounded by the declared probe count, the baseline contract the
      // IVF/PQ indexes accelerate at larger batch sizes
      "sim_topk_bruteforce" -> "fixed probe batch (vec_id slice)",
      "sim_knn_join" -> "fixed probe batch (vec_id slice)",
      "sim_hard_negatives" -> "fixed probe batch (vec_id slice)",
      "sim_ann_recall" -> "fixed probe batch; ground-truth reference side",
      "sim_ann_pq" -> "fixed probe batch (vec_id slice)",
      "sim_ann_ivfpq" -> "fixed probe batch + k-row IVF shortlist",
      "sim_ann_ivfpq_rerank" -> "fixed probe batch + k-row IVF shortlist",
      "sim_ann_ivfadc" -> "fixed probe batch + k-row IVF shortlist",
      "sim_mips_lsh" -> "fixed probe batch (vec_id slice)",
      // Decontamination / contamination eval sides: the benchmark gram
      // set is eval-corpus-sized by definition (the train corpus is the
      // unbounded side and is never shuffled)
      "text_contamination" -> "benchmark eval n-gram set",
      "decontam_span_stats" -> "benchmark eval gram set",
      "decontam_span_clean" -> "benchmark eval gram set",
      "decontam_embedding" -> "benchmark eval embedding set")
    def leaves(h: ResolvedHint) = h.collectLeaves()
    def allDimLeaves(h: ResolvedHint): Boolean =
      leaves(h).nonEmpty && leaves(h).forall(
        _.output.forall(a => dimPrefixes.exists(a.name.startsWith)))
    def allLocalLeaves(h: ResolvedHint): Boolean =
      leaves(h).nonEmpty && leaves(h).forall(_.isInstanceOf[LocalRelation])
    @annotation.tailrec
    def reducedTop(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
      case u if u.children.size == 1 => reducedTop(u.children.head)
      case _ => false
    }
    val offenders = dfs.keys.toSeq.sorted.flatMap { name =>
      val plan = dfs(name).queryExecution.analyzed
      val hints = plan.collect { case h: ResolvedHint => h }
      val bad = hints.filterNot(h =>
        allDimLeaves(h) || allLocalLeaves(h) || reducedTop(h.child) ||
          declaredHints.contains(name))
      if (bad.nonEmpty) Some(s"$name (${bad.size} hint(s))") else None
    }
    assert(offenders.isEmpty,
      s"forced broadcast on an undeclared unbounded input in: ${offenders.mkString(", ")}")
  }

  test("no action anywhere in the registry carries an oversized analyzed plan") {
    // Forces the full registry (construction + execution), then drains the
    // listener bus up to a marker query: the bus is FIFO, so once the
    // marker's event lands every prior action has been recorded.
    plans.size // force every query's construction AND execution
    spark.range(1).select(org.apache.spark.sql.functions.lit(MarkerLit)).collect()
    assert(markerSeen.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "listener bus did not drain to the marker in 60s")
    val offenders = {
      import scala.jdk.CollectionConverters._
      oversized.asScala.toSeq.sorted
    }
    assert(offenders.isEmpty,
      s"analyzed plans over $planNodeCap nodes (un-checkpointed iteration?):\n" +
        offenders.mkString("\n") +
        s"\nlargest plan seen (${maxNodesSeen.get} nodes) starts:\n${worstPlanHead.get}")
    info(s"largest analyzed plan across the registry: ${maxNodesSeen.get} nodes (cap $planNodeCap)")
  }

  test("metadata-only multimodal queries never read the payload bytes") {
    // mm_bytes reads media (hashes it); mm_frame_sample slices it — but
    // text_stats over the same table must scan only its own columns.
    val schemaLine = plans("text_stats").linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!schemaLine.contains("media") && !schemaLine.contains("embedding"),
      s"text_stats reads columns it does not use: $schemaLine")
  }
}
