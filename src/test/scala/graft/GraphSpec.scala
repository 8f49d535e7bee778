package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  // 1 -> {2,3}, 2 -> 3; node 3 is dangling (no out-edges)
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")

  test("pageRank: mass conserved, in-link ordering, dangling handled") {
    val r = Graph.pageRank(edges, 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    // teleport + dangling redistribution conserve total rank (grid dust only)
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass leaked: ${r.values.sum}")
    // 3 has two in-links, 2 has one, 1 has none
    assert(r(3L) > r(2L) && r(2L) > r(1L))
  }

  test("pageRank: zero iterations is the uniform start, multi-edges don't count twice") {
    val r0 = Graph.pageRank(edges, 0)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r0.values.toSet == Set(0.333333333))
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val a = Graph.pageRank(edges, 2).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Graph.pageRank(dup, 2).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a == b, "duplicate edge rows must not change the unweighted rank")
  }

  test("pageRank is partition-layout independent") {
    val a = Graph.pageRank(edges, 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Graph.pageRank(edges.repartition(7), 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a == b)
  }

  test("pageRank salted two-phase aggregate is bit-identical to flat") {
    // hub graph: node 0 receives an edge from every other node (celebrity
    // dst), plus a chain so ranks land on varied grid values
    val hub = ((1L to 200L).map(s => (s, 0L)) ++
      (1L until 200L).map(s => (s, s + 1))).toDF("src", "dst")
    for (g <- Seq(edges, hub)) {
      val flat = Graph.pageRank(g, 3).collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val salted = Graph.pageRank(g, 3, saltBuckets = 8).collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(flat == salted, "salted partial sums must not change any rank")
    }
  }

  test("degreeStats counts both directions with zero-fill") {
    val got = Graph.degreeStats(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((2L, 0L)), 2L -> ((1L, 1L)), 3L -> ((0L, 2L))))
  }
}
