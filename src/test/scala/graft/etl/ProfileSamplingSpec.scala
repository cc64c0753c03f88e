package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports nulls, distincts, and ranges per column") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None), (None, Some("a")), (Some(2), Some("b")))
      .toDF("x", "s")
    val got = Profile.profile(df, Seq("s", "x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSeq
    assert(got == Seq(
      ("s", 1L, 2L, "a", "b"),
      ("x", 1L, 2L, "1", "2")))
  }

  test("approxProfile matches exact counts within HLL error on small data") {
    val df = (1 to 500).map(i => (i.toLong, s"v${i % 37}")).toDF("id", "s")
    val exact = Profile.profile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = Profile.approxProfile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(3, n / 10), s"$c: $n vs ${approx(c)}")
    }
  }

  test("profile rejects duplicate and separator-colliding column lists") {
    val df = Seq((1, 2)).toDF("x", "y")
    intercept[IllegalArgumentException] { Profile.profile(df, Seq("x", "x")) }
    intercept[IllegalArgumentException] {
      Profile.profile(df.withColumnRenamed("x", "a__b"), Seq("a__b"))
    }
  }

  test("sampling then splitting is not degenerate (purpose salts decorrelate)") {
    val df = (1 to 4000).map(i => (i.toLong, i % 5)).toDF("id", "v")
    val sampled = Sampling.deterministicSample(df, 0.5, Seq("id"))
    val (tr, va, te) = Sampling.split(sampled, 0.7, 0.15, Seq("id"))
    // with a shared unsalted hash every sampled row would land in
    // train; salted hashes keep all three splits populated
    assert(tr.count() > 0 && va.count() > 0 && te.count() > 0)
    val n = sampled.count().toDouble
    assert(math.abs(tr.count() / n - 0.7) < 0.08)
  }

  test("deterministic sample is stable across runs and repartitioning") {
    val df = (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    val a = Sampling.deterministicSample(df, 0.3, Seq("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(df.repartition(13), 0.3, Seq("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05) // within 5pp of target
  }

  test("stratified sample honors per-stratum fractions") {
    val df = (1 to 3000).map(i =>
      (i.toLong, if (i % 3 == 0) "big" else "small")).toDF("id", "stratum")
    val out = Sampling.stratifiedSample(df, "stratum",
      Map("big" -> 0.5, "small" -> 0.1), Seq("id"))
    val counts = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("big") / 1000.0 - 0.5) < 0.1)
    assert(math.abs(counts("small") / 2000.0 - 0.1) < 0.05)
  }

  test("split is disjoint, exhaustive, and leak-free") {
    val df = (1 to 2000).map(i => (i.toLong, i % 7)).toDF("id", "v")
    val (tr, va, te) = Sampling.split(df, 0.7, 0.15, Seq("id"))
    val (ts, vs, es) = (tr.select("id").collect().map(_.getLong(0)).toSet,
      va.select("id").collect().map(_.getLong(0)).toSet,
      te.select("id").collect().map(_.getLong(0)).toSet)
    assert((ts & vs).isEmpty && (ts & es).isEmpty && (vs & es).isEmpty)
    assert(ts.size + vs.size + es.size == 2000)
    // membership survives repartitioning (no leakage on rerun)
    val (tr2, _, _) = Sampling.split(df.repartition(11), 0.7, 0.15, Seq("id"))
    assert(tr2.select("id").collect().map(_.getLong(0)).toSet == ts)
  }
}
