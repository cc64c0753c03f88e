package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RRF fusion semantics the oracle hash can't articulate: the fused
  * ranking must reward presence in BOTH modality lists, every output
  * row must come from at least one source list, and the score must be
  * exactly Σ 1/(60 + rank) over the lists the doc appears in.
  */
class RrfFusionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("fused output is the union of the two source lists with exact RRF scores") {
    val rows = VectorQueries.rrfFusion(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val bm = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val kn = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(bm.isDefined || kn.isDefined,
        s"doc ${r.getLong(1)} in neither source list")
      val expect = bm.map(v => 1.0 / (v + 60)).getOrElse(0.0) +
        kn.map(v => 1.0 / (v + 60)).getOrElse(0.0)
      val got = r.getDouble(4)
      assert(math.abs(got - expect) < 5e-5,
        s"doc ${r.getLong(1)}: rrf $got != 1/(60+r) sum $expect")
    }
    // ranks are a total order aligned with the score
    val byRank = rows.sortBy(_.getInt(0)).map(_.getDouble(4))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
      "fused score must be non-increasing in rank")
  }

  test("semanticDedup emits a total keep/drop assignment with in-cell min reps") {
    val rows = VectorQueries.semanticDedup(spark, sf).collect()
    assert(rows.length == 500, "assignment must cover every vector")
    // cell is int32 (it is the label column); read numerics by Number
    val cellOf = rows.map(r =>
      r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    var kept = 0
    rows.foreach { r =>
      val (vid, cell, rep, k) = (r.getLong(0),
        r.getAs[Number](1).longValue, r.getLong(2), r.getLong(3))
      assert(rep <= vid, s"rep $rep newer than member $vid")
      assert(cellOf(rep) == cell,
        s"rep $rep of $vid crosses cells (${cellOf(rep)} != $cell)")
      assert((k == 1L) == (rep == vid), s"kept flag inconsistent for $vid")
      if (k == 1L) kept += 1
    }
    // the fixture threshold must actually dedup something AND keep
    // something — a degenerate all-kept or all-dropped result would
    // make the oracle check vacuous
    assert(kept > 0 && kept < rows.length, s"degenerate keep set: $kept/500")
  }

  test("closure keep-set is contained in the one-hop keep-set") {
    // one-hop election keeps any vector with no DIRECT smaller
    // neighbor; the closure keeps only each component's minimum — so
    // closure-kept ⊆ one-hop-kept always (a component min has no
    // smaller neighbor anywhere), and the difference counts exactly
    // the chain-shaped clusters (edges 5–9 and 1–9: one-hop keeps
    // {1, 5}, closure keeps {1})
    def keepSet(rows: Array[org.apache.spark.sql.Row]): Set[Long] =
      rows.filter(_.getLong(3) == 1L).map(_.getLong(0)).toSet
    val oneHopRows = VectorQueries.semanticDedup(spark, sf).collect()
    val closureRows = VectorQueries.semanticDedupExact(spark, sf).collect()
    assert(closureRows.length == oneHopRows.length,
      "both elections must cover every vector")
    val oneHop = keepSet(oneHopRows)
    val closure = keepSet(closureRows)
    assert(closure.subsetOf(oneHop),
      s"closure kept ${closure -- oneHop} that one-hop dropped")
    assert(closure.nonEmpty && closure.size < closureRows.length,
      s"degenerate closure keep set: ${closure.size}")
    // closure reps must be globally consistent: a dropped vector's
    // rep must itself be kept (one-hop famously violates this on
    // chains — the rep of a dropped doc can be dropped too)
    val repOf = closureRows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    closureRows.foreach { r =>
      assert(closure.contains(repOf(r.getLong(0))),
        s"closure rep ${repOf(r.getLong(0))} of ${r.getLong(0)} was dropped")
    }
    // record the fixture's measured disagreement so a drift in either
    // election shows up here, not just in the oracle hash
    val disagree = (oneHop -- closure).size
    assert(disagree >= 0 && disagree <= oneHopRows.length / 2,
      s"unexpected one-hop-vs-closure divergence: $disagree")
  }

  test("a doc in both lists outranks a doc with the same single-list rank") {
    val rows = VectorQueries.rrfFusion(spark, sf).collect()
    val both = rows.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
    val single = rows.filter(r => r.isNullAt(2) ^ r.isNullAt(3))
    for (b <- both; s <- single) {
      val bBest = math.min(
        if (b.isNullAt(2)) Int.MaxValue else b.getInt(2),
        if (b.isNullAt(3)) Int.MaxValue else b.getInt(3))
      val sRank = if (s.isNullAt(2)) s.getInt(3) else s.getInt(2)
      if (bBest <= sRank)
        assert(b.getInt(0) < s.getInt(0),
          s"doc ${b.getLong(1)} (both lists, best $bBest) should outrank " +
            s"doc ${s.getLong(1)} (one list, rank $sRank)")
    }
  }
}
