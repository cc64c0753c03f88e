package graft.olap

import graft.SparkSpec
import graft.etl.SurrogateKeys
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves the distributed-rank ntile ([[OlapMore.ntileByRank]] over a
  * [[SurrogateKeys.scalable]] rank) is row-for-row identical to
  * Spark's own `ntile(k)` window — including the ragged cases where n
  * is not divisible by k (the first n mod k buckets hold one extra
  * row). This is what licenses q_ntile running without a
  * single-partition window at ANY table size.
  */
class NtileFormulaSpec extends SparkSpec {
  import spark.implicits._

  private def check(n: Int, k: Int): Unit = {
    // a shuffled value column so rank != input order, with duplicate
    // values so the id tie-break matters
    val df = (0 until n).map(i => ((i * 131071) % 97, i.toLong))
      .toDF("v", "id")
    val viaWindow = df
      .withColumn("t", ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "t")
    val ranked = SurrogateKeys.scalable(df, Seq(col("v"), col("id")), "rk")
    val viaFormula = ranked
      .withColumn("t", OlapMore.ntileByRank("rk", n.toLong, k.toLong))
      .select("id", "t")
    val w = viaWindow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f = viaFormula.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == w, s"n=$n k=$k: formula diverged from ntile window")
  }

  test("ntileByRank matches ntile(k) for divisible and ragged n") {
    for (n <- Seq(1, 2, 3, 4, 5, 7, 8, 37, 100, 101, 102, 103); k <- Seq(2, 4))
      check(n, k)
  }

  test("ntileByRank matches ntile for n smaller than k") {
    check(3, 4)
    check(1, 4)
    check(2, 5)
  }
}
