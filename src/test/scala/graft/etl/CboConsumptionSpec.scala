package graft.etl

import graft.SparkSpec

/** Proves the planner CONSUMES catalog statistics, closing the
  * round-15 verdict gap: `q_catalog_stats` proves ANALYZE reaches the
  * catalog (storage) and `CatalogStatsSpec` pins what is stored, but
  * nothing asserted that a PLANNING DECISION changes when stats are
  * present vs absent — the thing that actually matters at 100×, where
  * size-based broadcast selection and CBO join reorder read exactly
  * these numbers.
  *
  * Mechanism under test: CBO filter estimation. An unpartitioned
  * parquet catalog table always knows its RAW size from the file
  * listing (so a bare small-dim broadcast flip can't isolate catalog
  * stats — the first draft of this spec proved that), but a FILTERED
  * table's output size is only estimable from COLUMN statistics: with
  * no stats the Filter node keeps its child's full size and the join
  * stays sort-merge under a sub-file-size broadcast threshold; after
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS` the equality
  * filter's selectivity ≈ 1/ndv shrinks the estimate below the
  * threshold and the SAME query plans a BroadcastHashJoin. AQE is
  * disabled for the assertion so the flip is attributable to the
  * CATALOG stats, not runtime shuffle metrics (AQE's runtime re-plan
  * is the complementary mechanism with its own coverage).
  */
class CboConsumptionSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE FOR COLUMNS flips the filtered-dim join to broadcast") {
    spark.sql("DROP TABLE IF EXISTS graft_cbo_fact")
    spark.sql("DROP TABLE IF EXISTS graft_cbo_dim")
    spark.sql("CREATE TABLE graft_cbo_fact USING parquet " +
      s"OPTIONS (path '$sfTiny/lineitem.parquet')")
    spark.sql("CREATE TABLE graft_cbo_dim USING parquet " +
      s"OPTIONS (path '$sfTiny/orders.parquet')")
    // threshold far below even the COLUMN-PRUNED no-stats estimate
    // (projection estimation scales the file size by width ratio — a
    // file-size/2 threshold flipped on pruning alone, no stats
    // needed), yet far above the ~1/ndv-row post-ANALYZE estimate
    val dimBytes =
      java.nio.file.Files.size(java.nio.file.Paths.get(s"$sfTiny/orders.parquet"))
    val custKey = spark.sql(
      "SELECT o_custkey FROM graft_cbo_dim ORDER BY o_orderkey LIMIT 1")
      .collect()(0).get(0)
    val q = s"""SELECT f.l_orderkey, d.o_totalprice
               |FROM graft_cbo_fact f
               |JOIN graft_cbo_dim d ON f.l_orderkey = d.o_orderkey
               |WHERE d.o_custkey = $custKey""".stripMargin
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (dimBytes / 50).toString) {
      val before = spark.sql(q).queryExecution.executedPlan.toString
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        "without column stats the filter is unestimable (keeps the full " +
          s"file size) and must plan SMJ, got:\n$before")
      spark.sql("ANALYZE TABLE graft_cbo_dim COMPUTE STATISTICS " +
        "FOR COLUMNS o_custkey, o_orderkey, o_totalprice")
      val after = spark.sql(q).queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        "with column stats the 1/ndv filter estimate is far below the " +
          s"threshold and must broadcast — the planner did not consume " +
          s"the catalog stats:\n$after")
    }
    spark.sql("DROP TABLE IF EXISTS graft_cbo_fact")
    spark.sql("DROP TABLE IF EXISTS graft_cbo_dim")
  }
}
