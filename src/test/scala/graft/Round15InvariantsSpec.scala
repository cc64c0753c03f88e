package graft

import org.apache.spark.sql.Row

/** Structural invariants of the round-15 operators on the tiny
  * fixture — properties the DuckDB hash gate cannot state (it proves
  * value equality, not lawfulness): generalization-hierarchy
  * monotonicity, decomposition conservation, [0,1] ranges, and
  * interval containment. Each is a law of the OPERATOR, so a refactor
  * that keeps both engines wrong in the same way still fails here.
  */
class Round15InvariantsSpec extends SparkSpec {

  test("gen_ladder levels are a true generalization hierarchy (nested bands)") {
    // L0 (1k bands) refines L1 (5k) refines L2 (10k, nation dropped):
    // coarsening can only MERGE classes, so class count is
    // nonincreasing, the smallest class nondecreasing, and k=5 risk
    // mass nonincreasing with level
    val rows = graft.text.TextAnalytics.genLadder(spark, sfTiny)
      .orderBy("lvl").collect()
    assert(rows.length == 3)
    val classes = rows.map(_.getAs[Long]("n_classes"))
    val minCls = rows.map(_.getAs[Long]("min_class"))
    val risk = rows.map(_.getAs[Long]("rows_at_risk"))
    assert(classes.sliding(2).forall { case Array(a, b) => b <= a })
    assert(minCls.sliding(2).forall { case Array(a, b) => b >= a })
    assert(risk.sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("changepoint split conserves the day count and bounds the gain fraction") {
    val r = graft.olap.Analytics.changepoint(spark, sfTiny).head()
    val nDays = graft.schema.Tables.orders(spark, sfTiny)
      .select("o_orderdate").distinct().count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == nDays)
    val g = r.getAs[Double]("gain_frac")
    assert(g > 0.0 && g <= 1.0)
    assert(r.getAs[Double]("mean_left") > 0 && r.getAs[Double]("mean_right") > 0)
  }

  test("anova eta-squared is a variance share; Brown-Forsythe is nonnegative") {
    val a = graft.olap.OlapStats.anovaF(spark, sfTiny).head()
    assert(a.getAs[Long]("k_groups") == 5)
    val eta = a.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
    assert(a.getAs[Double]("f_stat") >= 0.0)
    val l = graft.olap.OlapStats.leveneBf(spark, sfTiny).head()
    assert(l.getAs[Double]("bf_stat") >= 0.0)
    assert(l.getAs[Long]("n_total") == a.getAs[Long]("n_total"))
  }

  test("runs test partitions non-tie days and bounds the run count") {
    val r = graft.olap.Analytics.runsTest(spark, sfTiny).head()
    val n = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_above") + r.getAs[Long]("n_below") == n)
    val runs = r.getAs[Long]("runs")
    assert(runs >= 1 && runs <= n)
  }

  test("transitivity is a closure ratio in [0,1] with wedge support") {
    val r = graft.vector.VectorQueries.transitivity(spark, sfTiny).head()
    val c = r.getAs[Double]("transitivity")
    assert(c >= 0.0 && c <= 1.0)
    // every triangle contributes exactly 3 closed wedges
    assert(3 * r.getAs[Long]("n_triangles") <= r.getAs[Long]("n_wedges"))
  }

  test("bootstrap percentile CI brackets the replicate mean") {
    val r = graft.text.CorpusOps.bootCi(spark, sfTiny).head()
    assert(r.getAs[Long]("n_replicates") == 20)
    val (lo, m, hi) = (r.getAs[Double]("ci_lo"),
      r.getAs[Double]("boot_mean"), r.getAs[Double]("ci_hi"))
    assert(lo <= m && m <= hi)
  }

  test("median polish residuals are nonnegative and the grid is complete") {
    val rows = graft.olap.Analytics.medianPolish(spark, sfTiny).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Double]("mean_abs_resid") >= 0.0))
  }

  test("merge matrix covers every residue class with positive checksums") {
    val rows = graft.etl.EtlQueries.mergeMatrix(spark, sfTiny).collect()
    assert(rows.map(_.getAs[Long]("key_mod")).toSet == Set(0L, 1L, 2L, 3L, 4L))
    assert(rows.forall(_.getAs[Long]("n_rows") > 0))
    assert(rows.forall(_.getAs[Long]("key_checksum") > 0))
  }

  test("burrows delta is symmetric-complete over source pairs and nonnegative") {
    val rows = graft.text.CorpusOps.burrowsDelta(spark, sfTiny).collect()
    val nSrc = graft.schema.Tables.documents(spark, sfTiny)
      .select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2)
    assert(rows.forall(_.getAs[Double]("delta") >= 0.0))
    assert(rows.forall(_.getAs[Long]("n_terms") <= 20))
  }
}
