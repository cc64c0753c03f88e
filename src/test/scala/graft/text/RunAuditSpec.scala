package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RunAudit orchestrator invariants: the report is complete, each
  * detail file matches its oracle-verified kernel, and the summary's
  * headline numbers are consistent with the details.
  */
class RunAuditSpec extends SparkSpec {

  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("graft_audit").toString
  private lazy val stats = RunAudit.audit(spark, sfTiny, outDir)

  test("report contains every audit plus the summary, all non-empty") {
    val expected = Set("constraints", "gopher_rules", "segment_dedup", "novelty",
      "source_skew", "source_overlap", "label_prop", "centroid_drift",
      "kanon", "cramers_v", "vocab_drift", "dup_rate", "centroid_outliers")
    assert(stats.map(_.audit).toSet == expected)
    stats.foreach { s =>
      assert(s.rows > 0, s"audit ${s.audit} wrote an empty report")
      assert(spark.read.parquet(s"$outDir/${s.audit}").count() == s.rows)
    }
    assert(spark.read.parquet(s"$outDir/_summary").count() == expected.size.toLong)
  }

  test("detail files equal the oracle-verified kernels they claim to be") {
    val fromKernel = DocOps.gopherRules(spark, sfTiny)
    val fromReport = spark.read.parquet(s"$outDir/gopher_rules")
    assert(fromReport.exceptAll(fromKernel).isEmpty &&
      fromKernel.exceptAll(fromReport).isEmpty,
      "gopher_rules report drifted from the q_gopher_rules kernel")
  }

  test("summary alerts are consistent with the details") {
    val byName = stats.map(s => s.audit -> s).toMap
    val seg = spark.read.parquet(s"$outDir/segment_dedup")
      .agg(sum(col("n_segments")) - sum(col("n_kept"))).collect()(0).getLong(0)
    assert(byName("segment_dedup").alert == seg.toDouble)
    val viol = spark.read.parquet(s"$outDir/constraints")
      .agg(sum(col("n_violations"))).collect()(0).getLong(0)
    assert(byName("constraints").alert == viol.toDouble)
    assert(byName("centroid_drift").alert <= 1.0 + 1e-9,
      "cosine drift headline above 1 — not a cosine")
    assert(byName("cramers_v").alert >= 0.0 && byName("cramers_v").alert <= 1.0 + 1e-9,
      "Cramér's V headline out of [0, 1]")
    val dupes = spark.read.parquet(s"$outDir/dup_rate")
      .agg(sum(col("n_dupes"))).collect()(0).getLong(0)
    assert(byName("dup_rate").alert == dupes.toDouble)
  }

  test("rerun converges: second run rewrites the same report") {
    val stats2 = RunAudit.audit(spark, sfTiny, outDir)
    assert(stats2.map(s => (s.audit, s.rows, s.alert)) ==
      stats.map(s => (s.audit, s.rows, s.alert)))
  }
}
