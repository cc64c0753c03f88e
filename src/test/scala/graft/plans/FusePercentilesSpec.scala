package graft.plans

import graft.SparkSpec
import graft.schema.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.CreateArray
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The percentile-fusion rule's contract: N scalar percentile calls
  * over the same column collapse to ONE array-percentile aggregate,
  * values unchanged; guarded cases (distinct, filtered, different
  * children, single call) pass through untouched.
  */
class FusePercentilesSpec extends SparkSpec {

  /** DISTINCT percentile aggregates (by resultId — the fused
    * AggregateExpression instance is shared across outputs, which is
    * exactly what makes PhysicalAggregation keep one buffer).
    */
  private def percentiles(plan: LogicalPlan): Seq[Percentile] =
    plan.collect { case n => n.expressions.flatMap(_.collect {
      case ae: AggregateExpression
        if ae.aggregateFunction.isInstanceOf[Percentile] => ae }) }
      .flatten
      .groupBy(_.resultId).values.map(_.head.aggregateFunction
        .asInstanceOf[Percentile]).toSeq

  private def runBoth(df: DataFrame): (Seq[Percentile], Seq[Percentile], Boolean) = {
    val analyzed = df.queryExecution.analyzed
    val rewritten = FusePercentiles(analyzed)
    val before = percentiles(analyzed)
    val after = percentiles(rewritten)
    val a = df.collect().toSeq
    val b = ColumnBridge.ofRows(spark, rewritten).collect().toSeq
    (before, after, a == b)
  }

  test("three scalar percentiles fuse to one array buffer, same values") {
    val df = Tables.lineitem(spark, sfTiny)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"),
        percentile(col("l_quantity"), lit(0.99)).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    val (before, after, same) = runBoth(df)
    assert(before.size == 3)
    assert(after.size == 1, s"expected one fused percentile, got ${after.size}")
    assert(after.head.percentageExpression.isInstanceOf[CreateArray])
    assert(same, "fused plan changed the result values")
  }

  test("nested percentile expressions fuse too (round over percentile)") {
    val df = Tables.orders(spark, sfTiny)
      .agg(round(percentile(col("o_totalprice"), lit(0.5)), 2).as("a"),
        round(percentile(col("o_totalprice"), lit(0.75)), 2).as("b"))
    val (before, after, same) = runBoth(df)
    assert(before.size == 2 && after.size == 1 && same)
  }

  test("different children and single calls stay unfused") {
    val df = Tables.lineitem(spark, sfTiny)
      .agg(percentile(col("l_quantity"), lit(0.5)).as("q"),
        percentile(col("l_extendedprice"), lit(0.5)).as("p"))
    val (before, after, same) = runBoth(df)
    assert(before.size == 2 && after.size == 2 && same,
      "different-column percentiles must not fuse")
  }

  test("duplicate percentages share one array slot") {
    val df = Tables.orders(spark, sfTiny)
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("a"),
        percentile(col("o_totalprice"), lit(0.5)).as("b"))
    val (_, after, same) = runBoth(df)
    assert(after.size == 1 && same)
    assert(after.head.percentageExpression
      .asInstanceOf[CreateArray].children.size == 1)
  }

  test("extension-built session applies the rule end-to-end") {
    // the shared test session has no extensions; prove the injection
    // path itself by checking the rule is registered in a session
    // built with the extensions config
    // getOrCreate would hand back the shared default session (and skip
    // the extensions); clear the defaults so a FRESH session builds on
    // the same SparkContext, then restore
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf locked into the shared
    // SparkContext; withExtensions applies per-session regardless
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    try {
      val df = Tables.orders(s2, sfTiny)
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("a"),
          percentile(col("o_totalprice"), lit(0.9)).as("b"))
      val fused = percentiles(df.queryExecution.optimizedPlan)
      // downstream ConstantFolding collapses the CreateArray to a
      // literal array — assert on the percentage TYPE
      assert(fused.size == 1 && fused.head.percentageExpression.dataType
        .isInstanceOf[org.apache.spark.sql.types.ArrayType],
        "extensions-config session did not apply FusePercentiles")
      // and the values equal the unfused session's
      val plain = Tables.orders(spark, sfTiny)
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("a"),
          percentile(col("o_totalprice"), lit(0.9)).as("b")).collect().toSeq
      assert(df.collect().toSeq == plain)
    } finally {
      // shared SparkContext: never stop s2; restore the suite session
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
