package graft.olap

import graft.SparkSpec

/** The approximate scale-path twins stay within declared tolerance of
  * their exact, oracle-checked counterparts (approximations are
  * engine-specific so they can't be in the DuckDB oracle set — this is
  * their correctness pin).
  */
class ApproxSpec extends SparkSpec {

  test("approxPercentiles tracks exact percentiles per segment") {
    val exact = OlapMore.percentiles(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = OlapMore.approxPercentiles(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (seg, (p50, p90, p99)) =>
      val (a50, a90, a99) = approx(seg)
      // 2% relative tolerance — generous for accuracy=10000 on this
      // data, tight enough to catch a wrong-column/wrong-quantile bug
      def close(e: Double, a: Double) = math.abs(a - e) <= e * 0.02
      assert(close(p50, a50) && close(p90, a90) && close(p99, a99),
        s"$seg: exact ($p50,$p90,$p99) vs approx ($a50,$a90,$a99)")
    }
  }

  test("approxDistinctBuyers tracks exact distinct counts per nation") {
    val exact = OlapQueries.distinctBuyers(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = OlapQueries.approxDistinctBuyers(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(3, n / 20), s"$k: $n vs ${approx(k)}")
    }
  }
}
