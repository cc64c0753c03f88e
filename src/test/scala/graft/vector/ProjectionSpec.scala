package graft.vector

import graft.SparkSpec
import graft.functions.VectorNative
import org.apache.spark.sql.functions._

/** Parity and JL-law checks for the random-projection kernels. */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, (1 to 64).map(i => i * 0.125 - 4.0)),
    (1L, (1 to 64).map(i => math.sin(i.toDouble))),
    (2L, Seq.fill(64)(1.0)))
    .toDF("vec_id", "v")

  test("native rademacher equals the left-associated closed-form columns") {
    // the oracle evaluates literal nested sums; the native kernel must
    // reproduce them bit-for-bit (index-order left fold, exact ±1
    // multiplies)
    def sign(j: Int, i: Int): Double = {
      import graft.functions.TextHashUtil
      if ((TextHashUtil.aj(j) * i + TextHashUtil.bj(j)) % TextHashUtil.P % 2 == 1L) 1.0
      else -1.0
    }
    val closed = (0 until 16).map { j =>
      (1 to 64).foldLeft(lit(0.0)) { (acc, i) =>
        acc + element_at(col("v"), i) * lit(sign(j, i))
      }.as(s"c$j")
    }
    val rows = vecs
      .select((col("vec_id") +: VectorNative.rademacher(col("v"), 16).as("p") +: closed): _*)
      .collect()
    rows.foreach { r =>
      val p = r.getSeq[Double](1)
      (0 until 16).foreach { j =>
        assert(p(j) == r.getDouble(2 + j), s"slot $j diverged: ${p(j)} vs ${r.getDouble(2 + j)}")
      }
    }
  }

  test("native sqDist equals the nested-sum form and is symmetric") {
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        VectorNative.sqDist(col("a.v"), col("b.v")).as("n"),
        (1 to 64).foldLeft(lit(0.0)) { (acc, i) =>
          val d = element_at(col("a.v"), i) - element_at(col("b.v"), i)
          acc + d * d
        }.as("closed"),
        VectorNative.sqDist(col("b.v"), col("a.v")).as("sym"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) == r.getDouble(2))
    }
  }

  test("q_rand_proj audit finds most pairs within the JL band") {
    val r = Projection.randProj(spark, sfTiny).collect().head
    val n = r.getAs[Long]("n_pairs")
    val within = r.getAs[Long]("n_within_25pct")
    assert(n > 0)
    assert(within * 2 >= n, s"only $within of $n pairs within ±25% distortion")
  }
}
