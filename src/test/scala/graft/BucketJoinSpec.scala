package graft

import graft.etl.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Pins the bucketed-table co-located join contract: two tables
  * written with the same `bucketBy` count on the join key join with
  * ZERO shuffle exchanges, while the identical join over plain
  * parquet shuffles both sides — the layout decision that deletes
  * the dominant exchange of a repeated fact⋈fact join at 100 TB.
  */
class BucketJoinSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    // materialize so AQE finalizes the plan, then count exchanges in
    // the EXECUTED plan (the initial AQE plan may still hold
    // placeholder stages)
    df.write.format("noop").mode("overwrite").save()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children ++ other.subqueries
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("same-bucket-count join is shuffle-free; plain join is not") {
    val orders = spark.read.parquet(s"$sfTiny/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfTiny/lineitem.parquet")
    Bucketing.saveBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.saveBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plain = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(shuffleCount(bucketed) === 0,
        "bucketed join must not shuffle either side")
      assert(shuffleCount(plain) >= 2,
        "negative control: the plain-parquet join shuffles both sides")
      assert(bucketed.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed aggregation on the bucket key is also shuffle-free") {
    val orders = spark.read.parquet(s"$sfTiny/orders.parquet")
    Bucketing.saveBucketed(orders, "b_orders_agg", "o_custkey", 4)
    try {
      val agg = spark.table("b_orders_agg")
        .groupBy("o_custkey").count()
      assert(shuffleCount(agg) === 0,
        "group-by on the bucket key must reuse the bucket partitioning")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }
}
