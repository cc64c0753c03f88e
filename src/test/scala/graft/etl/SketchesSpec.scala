package graft.etl

import graft.SparkSpec
import graft.schema.Tables
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables.orders(spark, sfTiny)
    .withColumn("m", date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM"))

  test("estimate is within HLL error of the exact distinct count") {
    val est = Sketches.unionEstimate(
      Sketches.sketchBy(orders, Seq("m"), "o_custkey"), Seq.empty)
      .select("n_distinct_est").as[Long].head()
    val exact = orders.select(countDistinct(col("o_custkey"))).as[Long].head()
    // lgK=12 → ~1.6% rel std error; 5% is ~3 sigma
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"est $est vs exact $exact")
  }

  test("merge-then-estimate equals the estimate of one global sketch") {
    val perMonth = Sketches.sketchBy(orders, Seq("m"), "o_custkey")
    val merged = Sketches.unionEstimate(perMonth, Seq.empty)
      .select("n_distinct_est").as[Long].head()
    val global = Sketches.unionEstimate(
      Sketches.sketchBy(orders.withColumn("g", lit(1)), Seq("g"), "o_custkey"),
      Seq.empty).select("n_distinct_est").as[Long].head()
    assert(merged == global)
  }

  test("sketches survive a parquet round-trip and still union (incremental refresh)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    // day 1: store January-half sketches; day 2: sketch only new data
    val (oldOrders, newOrders) =
      (orders.filter(col("o_orderkey") % 2 === 0), orders.filter(col("o_orderkey") % 2 =!= 0))
    Sketches.sketchBy(oldOrders, Seq("m"), "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/hll")
    val stored = spark.read.parquet(s"$dir/hll")
    val refreshed = stored.unionByName(Sketches.sketchBy(newOrders, Seq("m"), "o_custkey"))
    val est = Sketches.unionEstimate(refreshed, Seq.empty)
      .select("n_distinct_est").as[Long].head()
    val full = Sketches.unionEstimate(
      Sketches.sketchBy(orders, Seq("m"), "o_custkey"), Seq.empty)
      .select("n_distinct_est").as[Long].head()
    assert(est == full, s"incremental $est vs full-rebuild $full")
  }
}
