package graft.olap

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the round-17 decision-layer operators: the TA rank
  * join's early-stop must equal the full-join answer, the grid
  * ε-join must lose nothing versus brute force, conformal coverage
  * must meet its finite-sample guarantee, and FS EM posteriors must
  * be monotone in field agreements.
  */
class InferenceSpec extends SparkSpec {

  test("rank join TA result equals the full-join top-k at the tiny SF") {
    // at sf0.001 the initial prefix (64) spans most of the list, so
    // this pins the full-m fallback path AND the output contract
    val ta = OlapMore.rankJoin(spark, sfTiny).collect()
    assert(ta.length == 10)
    // oracle recomputation: full join, same rounding
    val r4 = (c: org.apache.spark.sql.Column) => floor(c * 10000.0 + 0.5) / 10000.0
    val r6 = (c: org.apache.spark.sql.Column) => floor(c * 1000000.0 + 0.5) / 1000000.0
    val spend = spark.read.parquet(s"$sfTiny/orders.parquet")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(r6(col("o_totalprice")).cast("decimal(28,6)")).as("sd"))
      .select(col("c_custkey"), r4(col("sd").cast("double")).as("sa"))
    val full = spark.read.parquet(s"$sfTiny/customer.parquet")
      .select(col("c_custkey"), r4(col("c_acctbal")).as("sb"))
      .join(spend, "c_custkey")
      .withColumn("combined", r4(col("sa") + col("sb")))
      .orderBy(col("combined").desc, col("c_custkey"))
      .limit(10).collect()
    assert(ta.map(_.getAs[Long]("c_custkey")).toSeq ==
      full.map(_.getAs[Long]("c_custkey")).toSeq)
    assert(ta.map(_.getAs[Double]("combined")).toSeq ==
      full.map(_.getAs[Double]("combined")).toSeq)
  }

  test("rank join TA early-stops correctly on a skewed synthetic list pair") {
    // construct lists where the combined top-10 is entirely inside the
    // first prefix (one dominant block) — TA must stop at m=64 and
    // still match the full sort; exercises the threshold compare
    import spark.implicits._
    val n = 2000
    val orders = (1 to n).flatMap { k =>
      // customer k spends 3*(n-k) in one order: top spenders = low keys
      Seq((k.toLong, (3.0 * (n - k)).toDouble))
    }.toDF("o_custkey", "o_totalprice")
    val cust = (1 to n).map { k =>
      (k.toLong, if (k <= 50) 1000.0 + k else (k % 7).toDouble)
    }.toDF("c_custkey", "c_acctbal")
    val dir = java.nio.file.Files.createTempDirectory("graft_ta").toString
    orders.write.parquet(s"$dir/orders.parquet")
    cust.write.parquet(s"$dir/customer.parquet")
    // region/nation unused by rankJoin; Tables reads lazily per table
    val got = OlapMore.rankJoin(spark, dir).collect()
    val want = cust.join(
        orders.groupBy(col("o_custkey").as("c_custkey"))
          .agg(sum(floor(col("o_totalprice") * 1000000.0 + 0.5) / 1000000.0)
            .as("sd")),
        "c_custkey")
      .select(col("c_custkey"),
        (floor(col("sd") * 10000.0 + 0.5) / 10000.0).as("sa"),
        (floor(col("c_acctbal") * 10000.0 + 0.5) / 10000.0).as("sb"))
      .withColumn("combined",
        floor((col("sa") + col("sb")) * 10000.0 + 0.5) / 10000.0)
      .orderBy(col("combined").desc, col("c_custkey"))
      .limit(10).collect()
    assert(got.map(_.getAs[Long]("c_custkey")).toSeq ==
      want.map(_.getAs[Long]("c_custkey")).toSeq)
  }

  test("grid join finds exactly the brute-force ε-pairs at the tiny SF") {
    val deg = graft.vector.VectorQueries.gridJoin(spark, sfTiny)
    val pts = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
    val eps = 0.02
    val brute = pts.as("a").join(pts.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
        (col("a.y") - col("b.y")) * (col("a.y") - col("b.y")) <= eps * eps)
      .select(explode_outer(array(col("a.vec_id"), col("b.vec_id"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_neighbors"))
    assert(deg.count() > 0, "grid join must be non-vacuous at sf0.001")
    assert(deg.exceptAll(brute).isEmpty && brute.exceptAll(deg).isEmpty)
  }

  test("conformal coverage meets the finite-sample guarantee per type") {
    // split-conformal: coverage >= 1 - alpha - 1/(n_cal+1) in
    // expectation; on this exchangeable-by-construction split demand
    // the practical bound coverage >= 0.85 (alpha = 0.1)
    val rows = Inference.conformal(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0.85 && cov <= 1.0,
        s"${r.getAs[String]("event_type")}: coverage $cov outside [0.85, 1]")
    }
  }

  test("FS posterior is monotone in the number of agreeing fields") {
    val rows = Inference.fellegiSunter(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    // average posterior by agreement count must be non-decreasing
    val byAgree = rows.groupBy(r => r.getAs[Int]("g_type") +
        r.getAs[Int]("g_size") + r.getAs[Int]("g_price"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("p_match")).max }
      .toSeq.sortBy(_._1)
    byAgree.sliding(2).foreach {
      case Seq((_, lo), (_, hi)) => assert(lo <= hi + 1e-9,
        s"posterior not monotone in agreements: $byAgree")
      case _ =>
    }
    rows.foreach { r =>
      val p = r.getAs[Double]("p_match")
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
