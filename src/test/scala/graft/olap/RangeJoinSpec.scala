package graft.olap

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Bucketed range join ≡ naive theta join on randomized data, for
  * bucket widths smaller, near, and larger than the interval spans —
  * the replicate-to-cells logic must not duplicate or drop matches at
  * any width.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val r = new Random(7)
  private val points = (1 to 300).map(i =>
    (s"k${r.nextInt(5)}", r.nextInt(1000).toLong, i))
  private val intervals = (1 to 80).map { i =>
    val s = r.nextInt(950).toLong
    (s"k${r.nextInt(5)}", s, s + r.nextInt(120).toLong, i)
  }

  private def naive = {
    val l = points.toDF("key", "pt", "pid")
    val rr = intervals.toDF("rkey", "start", "end", "iid")
    l.join(rr, l("key") === rr("rkey") &&
        l("pt") >= rr("start") && l("pt") <= rr("end"))
      .select("pid", "iid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
  }

  for (bucket <- Seq(1L, 16L, 128L, 4096L))
    test(s"pointInInterval matches the theta join exactly at bucket=$bucket") {
      val got = RangeJoin.pointInInterval(
        points.toDF("key", "pt", "pid"),
        intervals.toDF("key", "start", "end", "iid"),
        "key", "pt", "start", "end", bucket)
        .select("pid", "iid").collect().map(x => (x.getInt(0), x.getInt(1)))
      assert(got.length == got.toSet.size, "duplicated matches")
      assert(got.toSet == naive)
    }

  test("degenerate intervals (end < start) never match") {
    val got = RangeJoin.pointInInterval(
      Seq(("a", 5L, 1)).toDF("key", "pt", "pid"),
      Seq(("a", 10L, 2L, 1)).toDF("key", "start", "end", "iid"),
      "key", "pt", "start", "end", 4L)
    assert(got.count() == 0)
  }
}
