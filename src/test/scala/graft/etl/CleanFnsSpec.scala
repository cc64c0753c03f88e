package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operator edge cases from SURVEY.md §5.2 (reference semantics cited
  * per function in CleanFns).
  */
class CleanFnsSpec extends SparkSpec {
  import spark.implicits._

  test("ceil2 is a ceiling, not half-up rounding (F9)") {
    val got = Seq(19.991, 19.99, 3.001, 2.0, 0.005)
      .toDF("x").select(CleanFns.ceil2(col("x")).as("c"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(20.00, 19.99, 3.01, 2.0, 0.01))
  }

  test("ceil2 lands in [x, x+0.01)") {
    val xs = Seq(0.0001, 1.2345, 99.999, 123.456789)
    val got = xs.toDF("x").select(CleanFns.ceil2(col("x")).as("c"))
      .collect().map(_.getDouble(0))
    xs.zip(got).foreach { case (x, c) =>
      assert(c >= x && c < x + 0.01, s"ceil2($x) = $c")
    }
  }

  test("recode maps known keys and passes through unknown (F4)") {
    val m = Map("male" -> "M", "m" -> "M", "female" -> "F", "f" -> "F")
    val got = Seq("male", "f", "other", "MALE")
      .toDF("g").select(CleanFns.recode(col("g"), m).as("r"))
      .collect().map(_.getString(0))
    // pandas .replace is exact-match: "MALE" is not a key → pass-through
    assert(got.toSeq == Seq("M", "F", "other", "MALE"))
  }

  test("cleanTitle trims and initcaps whitespace-delimited words (F1+F3)") {
    val got = Seq("  john SMITH ", "o brien")
      .toDF("s").select(CleanFns.cleanTitle(col("s")).as("t"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("John Smith", "O Brien"))
  }

  test("coerceDouble nulls garbage, keeps numerics (F8)") {
    val got = Seq("1.5", "abc", "-2", "")
      .toDF("s").select(CleanFns.coerceDouble(col("s")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(1.5), None, Some(-2.0), None))
  }

  test("revenue = ceil2(quantity * price) (F10+F9)") {
    val got = Seq((3.0, 6.663667))
      .toDF("q", "p").select(CleanFns.revenue(col("q"), col("p")).as("r"))
      .collect().map(_.getDouble(0))
    // 3.0 * 6.663667 = 19.991001 → ceil2 → 20.00
    assert(got.head == math.ceil(3.0 * 6.663667 * 100) / 100)
    assert(got.head == 20.0)
  }
}
