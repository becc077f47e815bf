package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit over EVERY registered query: the shapes that kill a
  * 100 TB run must never appear, and scan-level optimizations must be
  * present where the query promises them. Runs at sf0.001 — plan shapes,
  * not data volume, are what's asserted. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf("sf0.001")

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
      "agg_kmv_intersect")

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

  test("no registry query force-broadcasts an unbounded anti-join input") {
    // Drop-list / exclusion-set anti-joins are where forced broadcasts OOM
    // at scale: a near-dup drop set is unbounded (dup-heavy crawls shed
    // 30-50% of docs), so the anti-join must be left to AQE, not pinned to
    // a broadcast. At sf0.001 AQE may still CHOOSE broadcast — the audit
    // asserts the choice is not FORCED anywhere in the registry: no ANTI
    // join may carry a broadcast hint on its build side UNLESS every leaf
    // relation under the hint is a true bounded dimension (the TPC-H dims,
    // recognized by their s_/p_/n_/r_ column prefixes — e.g. q16's
    // negative-balance supplier exclusion list is supplier-sized and may
    // legitimately pin its broadcast).
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, ResolvedHint}
    val dimPrefixes = Seq("s_", "p_", "n_", "r_")
    def boundedDim(h: ResolvedHint): Boolean =
      h.collectLeaves().nonEmpty && h.collectLeaves().forall(
        _.output.forall(a => dimPrefixes.exists(a.name.startsWith)))
    // A hint forces THIS join only if it sits above the build side's first
    // binary node — hints attach to the nearest enclosing join, so a
    // bounded broadcast feeding an inner semi-join (e.g. the benchmark
    // gram set inside the decontamination span pipeline) is not a forced
    // build for the outer anti-join.
    @annotation.tailrec
    def topHint(p: LogicalPlan): Option[ResolvedHint] = p match {
      case h: ResolvedHint => Some(h)
      case u if u.children.size == 1 => topHint(u.children.head)
      case _ => None
    }
    val offenders = dfs.keys.toSeq.sorted.flatMap { name =>
      val plan = dfs(name).queryExecution.analyzed
      val forced = plan.collect {
        case j: Join if j.joinType.sql.contains("ANTI") =>
          topHint(j.right).filterNot(boundedDim)
      }.flatten
      if (forced.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"forced broadcast on an unbounded anti-join input in: ${offenders.mkString(", ")}")
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
