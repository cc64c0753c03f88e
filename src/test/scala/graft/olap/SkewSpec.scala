package graft.olap

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the plain aggregate on a skewed key distribution") {
    // 10k rows of hot key + sparse tail — the shape salting exists for
    val rows = (1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", salt = 16)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted partials actually split the hot key") {
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val partials = df
      .withColumn("__salt", pmod(hash(col("v")), lit(16)))
      .groupBy("k", "__salt").count()
    assert(partials.count() > 1) // hot key spread over multiple reducers
  }
}
