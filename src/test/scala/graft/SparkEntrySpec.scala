package graft

/** Driver-contract invariants: the pack aggregation must not silently
  * drop queries (Map ++ overwrites on key collision), every oracle
  * entry must have a query, and the flagship must be non-vacuous.
  */
class SparkEntrySpec extends SparkSpec {

  test("pack aggregation loses no queries to name collisions") {
    val packs = Seq(
      etl.EtlQueries.queries, olap.OlapQueries.queries,
      olap.OlapMore.queries, olap.Analytics.queries,
      olap.Inference.queries,
      olap.OlapStats.queries, olap.Skew.queries, olap.SqlSurface.queries,
      olap.Subqueries.queries,
      stream.EventQueries.queries, text.TextQueries.queries,
      text.TextAnalytics.queries, text.CorpusOps.queries,
      text.DocOps.queries, text.GrowthOps.queries,
      vector.VectorQueries.queries, vector.Projection.queries,
      multimodal.MediaQueries.queries)
    val total = packs.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"aggregated ${SparkEntry.queries.size} of $total — duplicate query name across packs")
  }

  test("every oracle key has a query; every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    // the contract allows omitting oracles for non-SQL-expressible
    // queries, but every current query IS oracle-checked — losing one
    // silently would weaken the gate, so pin the full set
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no oracle SQL carries a zero-interpolated constant") {
    // Scala object vals initialize in declaration order: an oracle SQL
    // val that interpolates a constant declared BELOW it silently
    // embeds 0 (q_topk_refresh shipped `vec_id % 0` this way). Scan
    // for the signatures of a zeroed divisor/modulus/limit.
    val bad = "(?i)(% 0\\b|// 0\\b|DIV 0\\b|LIMIT 0\\b|range\\(1, 0\\b)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val hit = bad.findFirstIn(sql)
      assert(hit.isEmpty, s"$name oracle embeds a zeroed constant: $hit")
    }
  }
}
