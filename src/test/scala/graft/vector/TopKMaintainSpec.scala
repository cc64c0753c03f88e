package graft.vector

import graft.SparkSpec
import graft.schema.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental top-k correctness: refreshing a per-probe top-k with a
  * delta batch must equal the full recompute row-for-row, including
  * through sequential refreshes (the mergeable-summary property of
  * top-k under a total order).
  */
class TopKMaintainSpec extends SparkSpec {

  private val K = 5

  private lazy val vecs = Tables.embeddings(spark, sfTiny)
    .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
    .withColumn("nrm", VectorFns.norm(col("v")))

  private lazy val probes = vecs.filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("probe_id"), col("v").as("pv"),
      col("nrm").as("pnrm"))

  private def fullTopK(corpus: DataFrame): DataFrame = {
    val byProbe = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim",
        VectorFns.cosineStaged(col("v"), col("pv"), col("nrm"), col("pnrm")))
      .withColumn("rk", row_number().over(byProbe))
      .filter(col("rk") <= K)
      .select("probe_id", "vec_id", "sim")
  }

  private def sorted(df: DataFrame) =
    df.orderBy("probe_id", "vec_id").collect().toSeq

  test("one refresh equals the full recompute") {
    val old = vecs.filter(col("vec_id") % 2 === 0)
    val delta = vecs.filter(col("vec_id") % 2 === 1)
    val got = TopKMaintain.refreshTopK(fullTopK(old), probes, delta, K)
    assert(sorted(got) == sorted(fullTopK(vecs)))
  }

  test("sequential refreshes converge to the full recompute") {
    var snap = fullTopK(vecs.filter(col("vec_id") % 3 === 0))
    (1 to 2).foreach { r =>
      snap = TopKMaintain.refreshTopK(
        snap, probes, vecs.filter(col("vec_id") % 3 === r), K)
    }
    assert(sorted(snap) == sorted(fullTopK(vecs)))
  }

  test("an empty delta is a no-op") {
    val snap = fullTopK(vecs)
    val got = TopKMaintain.refreshTopK(
      snap, probes, vecs.filter(col("vec_id") < 0), K)
    assert(sorted(got) == sorted(snap))
  }
}
