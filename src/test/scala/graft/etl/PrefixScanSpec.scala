package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Distributed prefix scan ≡ the single-partition window form, at
  * partition counts that force multi-partition offset stitching.
  */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  private val r = new Random(11)
  private val rows = (1 to 500).map(i => (i.toLong, (r.nextInt(20) + 1).toLong))

  test("exclusivePrefixSum matches the window scan across partitions") {
    val df = rows.toDF("id", "v")
    val windowed = df.withColumn("p",
        coalesce(sum(col("v")).over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = PrefixScan.exclusivePrefixSum(df, "id", "v", "p", parts)
        .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
      assert(got == windowed, s"mismatch at $parts partitions")
    }
  }

  test("exclusivePrefixMax matches the window scan across partitions") {
    val df = rows.toDF("id", "v")
    val windowed = df.withColumn("p",
        coalesce(max(col("v")).over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = PrefixScan.exclusivePrefixMax(df, "id", "v", "p", 0L, parts)
        .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
      assert(got == windowed, s"mismatch at $parts partitions")
    }
  }

  test("packByCapacity fills shards in order without overflow gaps") {
    val df = rows.toDF("id", "v")
    val packed = PrefixScan.packByCapacity(df, "id", "v", capacity = 100)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // shard ids are non-decreasing in id order and start at 0
    assert(packed.head._3 == 0L)
    packed.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 && b._3 - a._3 <= 1, s"shard gap between $a and $b")
    }
    // every shard except possibly the last holds >= capacity - max(v) + 1 units
    val byShard = packed.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val full = byShard.keys.toSeq.sorted.dropRight(1)
    full.foreach { s =>
      assert(byShard(s) + 20 > 100, s"shard $s underfilled: ${byShard(s)}")
    }
  }
}
