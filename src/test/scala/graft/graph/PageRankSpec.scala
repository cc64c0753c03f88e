package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank kernel semantics: centrality ordering on a known
  * graph, mass conservation up to floor leakage, and partition-layout
  * independence (the property the integer formulation exists for).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // star: 0 joined to 1..6, plus a detached edge 7-8
  private def starEdges = {
    val pairs = (1L to 6L).map(i => (0L, i)) :+ (7L, 8L)
    val df = pairs.toDF("src", "dst")
    df.union(df.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("hub outranks leaves; detached pair ranks between") {
    val ranks = PageRank.integerRanks(starEdges, 3, 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hub = ranks(0L)
    val leaves = (1L to 6L).map(ranks)
    assert(leaves.toSet.size == 1, "symmetric leaves diverged")
    assert(hub > leaves.head * 3, s"hub $hub not dominant over ${leaves.head}")
    assert(ranks(7L) == ranks(8L), "detached pair asymmetric")
    assert(ranks(7L) > leaves.head && ranks(7L) < hub)
  }

  test("rank mass is conserved up to floor leakage") {
    val total = PageRank.integerRanks(starEdges, 3, 1000000L)
      .agg(sum("r")).collect()(0).getLong(0)
    // each of the 9 nodes can leak < 1 unit per term per round; the
    // true total is the scale
    assert(total <= 1000000L && total > 1000000L - 9 * 4 * 3)
  }

  test("in-degree-0 source keeps its base term (directed contract)") {
    // 0 → 1 → 2 → 1: node 0 has out-degree 1 (contract OK) but
    // in-degree 0 — it receives no contributions, yet must stay in
    // the output with the (1-d)/N base term each round, not vanish
    // through an inner contribution join.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val ranks = PageRank.integerRanks(edges, 3, 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ranks.contains(0L), "in-degree-0 node dropped from output")
    // base term = 15*scale/(100*N) with N=3
    assert(ranks(0L) == 15L * 1000000L / (100L * 3L))
    assert(ranks(1L) > ranks(2L), "cycle hub should outrank its leaf")
  }

  test("ranks are identical under different partition layouts") {
    val a = PageRank.integerRanks(starEdges.repartition(1), 3, 1000000L)
      .orderBy("v").collect().toSeq
    val b = PageRank.integerRanks(starEdges.repartition(13), 3, 1000000L)
      .orderBy("v").collect().toSeq
    assert(a == b)
  }
}
