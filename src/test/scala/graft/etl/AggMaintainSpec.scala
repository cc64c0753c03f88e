package graft.etl

import graft.SparkSpec
import graft.schema.Tables
import org.apache.spark.sql.functions._

/** Incremental-aggregate correctness: refreshing a snapshot with a
  * delta batch must equal the full recompute (the q_delta_dedup
  * incremental-correctness property, applied to additive aggregates),
  * including across multiple sequential refreshes.
  */
class AggMaintainSpec extends SparkSpec {

  private val keys = Seq("l_returnflag", "l_linestatus")
  private val measures = Seq("qty", "cnt")

  private def prepared = Tables.lineitem(spark, sfTiny)
    .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
      col("l_quantity").cast("decimal(18,4)").as("qty"), lit(1L).as("cnt"))

  private def fullAgg(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(keys.map(col): _*)
    .agg(sum("qty").as("qty"), sum("cnt").as("cnt"))

  test("one refresh equals the full recompute") {
    val li = prepared
    val old = li.filter(col("l_orderkey") % 2 === 0)
    val delta = li.filter(col("l_orderkey") % 2 === 1)
    val got = AggMaintain.refreshAdditive(fullAgg(old), delta, keys, measures)
      .orderBy(keys.map(col): _*).collect().toSeq
    val want = fullAgg(li).orderBy(keys.map(col): _*).collect().toSeq
    assert(got == want)
  }

  test("sequential refreshes converge to the full recompute") {
    val li = prepared
    var snap = fullAgg(li.filter(col("l_orderkey") % 3 === 0))
    (1 to 2).foreach { r =>
      snap = AggMaintain.refreshAdditive(
        snap, li.filter(col("l_orderkey") % 3 === r), keys, measures)
    }
    val got = snap.orderBy(keys.map(col): _*).collect().toSeq
    val want = fullAgg(li).orderBy(keys.map(col): _*).collect().toSeq
    assert(got == want)
  }

  test("a delta with only new groups appends them") {
    val li = prepared
    val old = li.filter(col("l_returnflag") === "R")
    val delta = li.filter(col("l_returnflag") =!= "R")
    val refreshed = AggMaintain.refreshAdditive(fullAgg(old), delta, keys, measures)
    assert(refreshed.count() == fullAgg(li).count())
  }

  test("retraction refresh equals full recompute of base∪inserts∖deletes") {
    val li = prepared
    val snap = fullAgg(li.filter(col("l_orderkey") % 3 =!= 2))
    val got = AggMaintain.refreshWithRetractions(snap,
        inserts = li.filter(col("l_orderkey") % 3 === 2),
        deletes = li.filter(col("l_orderkey") % 3 === 1),
        keys, measures, countMeasure = "cnt")
      .orderBy(keys.map(col): _*).collect().toSeq
    val want = fullAgg(li.filter(col("l_orderkey") % 3 =!= 1))
      .orderBy(keys.map(col): _*).collect().toSeq
    assert(got == want)
  }

  test("retracting every row of a group drops the group, not a zero tombstone") {
    val li = prepared
    val rOnly = li.filter(col("l_returnflag") === "R")
    val snap = fullAgg(li)
    val refreshed = AggMaintain.refreshWithRetractions(snap,
      inserts = li.limit(0), deletes = rOnly, keys, measures, countMeasure = "cnt")
    assert(refreshed.filter(col("l_returnflag") === "R").count() == 0)
    val got = refreshed.orderBy(keys.map(col): _*).collect().toSeq
    val want = fullAgg(li.filter(col("l_returnflag") =!= "R"))
      .orderBy(keys.map(col): _*).collect().toSeq
    assert(got == want)
  }
}
