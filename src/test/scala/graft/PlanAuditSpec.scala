package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit over EVERY registered query: the shapes that kill a
  * 100 TB run must never appear, and scan-level optimizations must be
  * present where the query promises them. Runs at sf0.001 — plan shapes,
  * not data volume, are what's asserted. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf("sf0.001")

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      val df = fn(spark, sf)
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
      "sim_hard_negatives")

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
    // driver before filtering. The regex-heavy scoring projection must be
    // persisted before that action — the returned plan then reads the
    // CACHED relation (InMemoryTableScan) instead of re-scanning and
    // re-scoring the documents text, which at 100 TB would double the
    // dominant cost.
    Seq("quality_gate", "curation_funnel").foreach { q =>
      assert(plans(q).contains("InMemoryTableScan"),
        s"$q re-scans the corpus instead of reading the cached scores:\n${plans(q)}")
    }
  }

  test("the curation funnel's near-dup drop list is not force-broadcast") {
    // the dropped-doc set is unbounded (dup-heavy crawls shed 30-50%), so
    // the final anti-join must be left to AQE, not pinned to a broadcast
    // that OOMs at scale. At sf0.001 AQE may still CHOOSE broadcast — the
    // audit asserts the choice is not FORCED: no LeftAnti join may have a
    // hint as its immediate build-side input. (Bounded broadcasts deeper in
    // the pipeline — candidate-id semi-join pruning — are fine and stay.)
    import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
    val df = SparkEntry.queries("curation_funnel")(spark, sf)
    val forced = df.queryExecution.analyzed.collect {
      case j: Join if j.joinType.sql.contains("ANTI") &&
        j.right.isInstanceOf[ResolvedHint] => j
    }
    assert(forced.isEmpty,
      s"curation_funnel force-broadcasts an anti-join input: $forced")
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
