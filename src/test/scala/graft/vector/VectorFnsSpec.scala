package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
      (Seq(1.0, 1.0, 0.0), Seq(-1.0, -1.0, 0.0)))
      .toDF("a", "b")
      .select(VectorFns.cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("dot is a left fold (matches sequential sum)") {
    val a = Seq(0.1, 0.2, 0.3, 0.4)
    val b = Seq(0.4, 0.3, 0.2, 0.1)
    val expected = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b"))).collect().head.getDouble(0)
    assert(got == expected)
  }

  test("native dot is bit-identical to the interpreted HOF fold") {
    // values chosen to accumulate rounding error — any association
    // difference between the two paths would surface in the low bits
    val vecs = Seq(
      (Seq(0.1, 0.2, 0.3, 1e15, -1e15, 0.7), Seq(0.3, 0.1, 0.9, 1.0, 1.0, 0.2)),
      (Seq.tabulate(64)(i => math.sin(i + 1.0)), Seq.tabulate(64)(i => math.cos(i * 0.7))))
    val df = vecs.toDF("a", "b").select(
      VectorFns.dot(col("a"), col("b")).as("native"),
      VectorFns.dotHof(col("a"), col("b")).as("hof"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("native sqErr is bit-identical to the HOF transform+fold+max pipeline") {
    // replicate q_sq_error's exact former HOF form (transform with
    // floor-quantize, aggregate left fold / n, array_max) against the
    // one-pass kernel on awkward values: negatives, degenerate dims
    // (mn = mx), rounding-boundary points
    val vecs = Seq(
      Seq(0.15, -2.7, 5.0, 0.0),
      Seq(0.1001, 3.3, 5.0, 1.0 / 3.0),
      Seq(-0.5, 0.0, 5.0, 0.9999))
    val mns = Seq(-0.5, -2.7, 5.0, 0.0)
    val mxs = Seq(0.15, 3.3, 5.0, 1.0)
    val df = vecs.map(v => (v, mns, mxs)).toDF("v", "mns", "mxs")
      .withColumn("errs", expr(
        """transform(v, (x, i) ->
          |  CASE WHEN element_at(mxs, i + 1) = element_at(mns, i + 1) THEN 0.0D
          |  ELSE abs(x - (element_at(mns, i + 1) +
          |    floor((x - element_at(mns, i + 1)) /
          |          (element_at(mxs, i + 1) - element_at(mns, i + 1)) * 255 + 0.5D)
          |    / 255 *
          |    (element_at(mxs, i + 1) - element_at(mns, i + 1)))) END)""".stripMargin))
      .select(
        graft.functions.VectorNative.sqErr(col("v"), col("mns"), col("mxs")).as("me"),
        (aggregate(col("errs"), lit(0.0), (a, e) => a + e) / size(col("v"))).as("hof_mean"),
        array_max(col("errs")).as("hof_max"))
    df.collect().foreach { r =>
      val me = r.getSeq[Double](r.fieldIndex("me"))
      assert(java.lang.Double.doubleToRawLongBits(me(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("hof_mean")))
      assert(java.lang.Double.doubleToRawLongBits(me(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("hof_max")))
    }
  }

  test("native dot returns null on length mismatch (zip_with parity)") {
    val got = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b"))).collect().head
    assert(got.isNullAt(0))
  }

  test("signBucket encodes hyperplane signs at the strided dims") {
    // dims 1, 3, 5 (1-based) with bits=3, stride=2
    val df = Seq(
      Seq(1.0, 9.0, -1.0, 9.0, 1.0), // signs +,-,+ → bits 0 and 2 → 5
      Seq(-1.0, 9.0, -1.0, 9.0, -1.0)) // all non-positive → 0
      .toDF("v").select(VectorFns.signBucket(col("v"), 3, 2).as("b"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L, 0L))
  }

  test("toDouble casts float vectors exactly") {
    val got = Seq(Seq(1.5f, -2.25f)).toDF("v")
      .select(VectorFns.toDouble(col("v"))).collect().head.getSeq[Double](0)
    assert(got == Seq(1.5, -2.25))
  }
}
