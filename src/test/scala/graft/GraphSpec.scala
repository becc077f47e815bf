package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Unit coverage for the fixed-point PageRank operator (the harness query
  * `graph_pagerank` hash-checks the full 5-iteration replay against the
  * DuckDB oracle; these pin the algebraic properties directly). */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(iters: Int, edges: (Long, Long)*): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters = iters)
      .as[(Long, Long)].collect().toMap

  test("2-cycle is the fixpoint: ranks stay exactly at scale") {
    // base + 0.85·scale = 0.15·scale + 0.85·scale = scale, exactly, every
    // iteration — integer arithmetic loses nothing here.
    for (it <- Seq(0, 1, 5)) {
      assert(ranks(it, (1L, 2L), (2L, 1L)) ==
        Map(1L -> Graph.DefaultScale, 2L -> Graph.DefaultScale))
    }
  }

  test("star center outranks leaves; leaves tie") {
    // symmetrized 4-leaf star: 0 receives four full contributions
    val leaves = (1L to 4L)
    val edges = leaves.flatMap(l => Seq((0L, l), (l, 0L)))
    val got = ranks(5, edges: _*)
    assert(leaves.map(got).toSet.size == 1, "leaves must tie exactly")
    assert(got(0L) > got(1L) * 2, "center must clearly dominate")
  }

  test("parallel edges act as weights") {
    // 1 splits its vote across edge ROWS: 2 gets 1/2 of it with a single
    // edge, 2/3 of it when the edge to 2 is doubled
    val single = ranks(1, (1L, 2L), (1L, 3L))
    val doubled = ranks(1, (1L, 2L), (1L, 2L), (1L, 3L))
    assert(doubled(2L) > single(2L), "doubling an out-edge must raise the target's rank")
    assert(doubled(3L) < single(3L), "the third of the vote left must shrink")
  }

  test("mass is conserved up to integer-floor leakage on a symmetric graph") {
    val edges = (1L to 20L).flatMap(i => Seq((i, i % 20 + 1), (i % 20 + 1, i)))
    val got = ranks(5, edges: _*)
    val total = got.values.sum
    val ideal = 20L * Graph.DefaultScale
    assert(total <= ideal, "integer floors can only lose mass")
    assert(total > ideal - ideal / 1000, "leakage must stay below 0.1%")
  }

  test("dangling node leaks deterministically, result reproducible") {
    val a = ranks(4, (1L, 2L), (3L, 2L))
    val b = ranks(4, (1L, 2L), (3L, 2L))
    assert(a == b)
    // 2 absorbs but never redistributes; sources decay to the base rank
    val base = 15L * Graph.DefaultScale / 100L
    assert(a(1L) == base && a(3L) == base)
    assert(a(2L) > a(1L))
  }
}
