package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The UDAF extension surface (SURVEY.md §2.7): a typed Aggregator
  * registered through BOTH `functions.udaf` (Column API) and
  * `spark.udf.register` (SQL), plus the merge algebra that makes it
  * correct under partial aggregation.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val agg = new TopKAgg(3)

  test("reduce keeps the k largest in descending order with O(k) state") {
    val buf = Seq(5.0, 1.0, 9.0, 7.0, 3.0, 9.0).foldLeft(agg.zero)(agg.reduce)
    assert(buf == List(9.0, 9.0, 7.0))
    assert(buf.length <= 3)
  }

  test("merge is order-insensitive (partial-aggregation algebra)") {
    val a = List(9.0, 4.0, 2.0)
    val b = List(8.0, 7.0, 1.0)
    assert(agg.merge(a, b) == agg.merge(b, a))
    assert(agg.merge(a, b) == List(9.0, 8.0, 7.0))
    assert(agg.merge(agg.zero, a) == a)
  }

  test("Column API: udaf(TopKAgg) matches sort+limit per group") {
    val df = Seq(("a", 1.0), ("a", 5.0), ("a", 3.0), ("a", 4.0), ("b", 2.0))
      .toDF("g", "v")
    // 8 partitions on 5 rows forces merges of partial buffers
    val top3 = udaf(new TopKAgg(3))
    val got = df.repartition(8).groupBy("g").agg(top3(col("v")).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(5.0, 4.0, 3.0))
    assert(got("b") == Seq(2.0))
  }

  test("SQL API: register exposes the aggregator to spark.sql") {
    spark.udf.register("graft_top3", udaf(new TopKAgg(3)))
    Seq(("a", 1.0), ("a", 5.0), ("a", 3.0), ("a", 4.0)).toDF("g", "v")
      .createOrReplaceTempView("topk_in")
    val got = spark.sql(
      "SELECT g, graft_top3(v) AS top FROM topk_in GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(5.0, 4.0, 3.0))
  }
}
