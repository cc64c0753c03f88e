package graft.vector

import graft.SparkSpec
import graft.schema.Tables
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Vector-index lifecycle: the persisted layout must serve the same
  * answer as the from-scratch multi-probe query, the serve scan must
  * physically prune to the probed bucket directories, and an
  * incremental append must converge to the full rebuild.
  */
class RunIndexSpec extends SparkSpec {

  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("graft_index").toString
  private lazy val built = RunIndex.build(spark, sfTiny, outDir)

  test("serve from the persisted index equals the from-scratch multi-probe query") {
    assert(built.rows > 0)
    val got = RunIndex.serve(spark, outDir, probeVecId = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = VectorQueries.annMultiprobe(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("serve prunes partitions: only the probed bucket directories are read") {
    built
    val scans = RunIndex.serve(spark, outDir, probeVecId = 0L)
      .queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }
      .filter(_.relation.partitionSchema.fieldNames.contains("bucket"))
    assert(scans.nonEmpty, "no partitioned scan in the serve plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "bucket filter not a partition filter")
    val selected = scan.selectedPartitions.partitionCount
    assert(selected <= 7, s"read $selected partitions, expected <= bits+1 = 7")
  }

  test("IVF layout serves the probe's cell only and matches q_ivf_search") {
    val dir = java.nio.file.Files.createTempDirectory("graft_index_ivf").toString
    assert(RunIndex.buildIvf(spark, sfTiny, dir).rows > 0)
    val got = RunIndex.serveIvf(spark, dir, probeVecId = 0L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val want = VectorQueries.ivfSearch(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(got == want)
    val scans = RunIndex.serveIvf(spark, dir, probeVecId = 0L)
      .queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }
      .filter(_.relation.partitionSchema.fieldNames.contains("cell"))
    assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"read ${scans.head.selectedPartitions.partitionCount} cells, expected 1")
  }

  test("incremental append converges to the full rebuild") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_index_a").toString
    // build from even ids only, then append the odd delta
    val vecs = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("label"),
        VectorFns.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))
    graft.etl.Warehouse.writePartitioned(
      vecs.filter(col("vec_id") % 2 === 0)
        .withColumn("bucket", VectorFns.signBucket(col("v"), 6, 10))
        .select("vec_id", "label", "v", "nrm", "bucket"),
      s"$dirA/vectors", Seq("bucket"))
    RunIndex.append(spark, vecs.filter(col("vec_id") % 2 === 1), dirA)
    val got = RunIndex.serve(spark, dirA, probeVecId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val want = RunIndex.serve(spark, outDir, probeVecId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == want)
  }
}
