package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins [[TextHashUtil.jaroWinkler]] to the DuckDB
  * `jaro_winkler_similarity` contract: textbook values, the edge
  * choices that differ across published implementations (empty
  * strings, boost threshold, integer transposition floor), and an
  * LCG fuzz against an independent reference implementation. The
  * oracle query (`q_jaro_winkler`) is the cross-engine half of the
  * proof; this spec is the in-JVM half.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    TextHashUtil.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent reference: same contract, written over String chars
    * with a straightforward mutable-list transposition walk.
    */
  private def ref(a: String, b: String): Double = {
    val (n, m) = (a.length, b.length)
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val bUsed = Array.fill(m)(false)
    val aMatch = collection.mutable.ArrayBuffer.empty[Char]
    val bPos = collection.mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until n) {
      val hit = (math.max(0, i - window) to math.min(m - 1, i + window))
        .find(j => !bUsed(j) && a(i) == b(j))
      hit.foreach { j => bUsed(j) = true; aMatch += a(i); bPos += j }
    }
    val c = aMatch.size
    if (c == 0) return 0.0
    val bMatch = bPos.sorted.map(b(_))
    val t = aMatch.zip(bMatch).count { case (x, y) => x != y } / 2
    var j = (c.toDouble / n + c.toDouble / m + (c - t).toDouble / c) / 3.0
    if (j > 0.7) {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      j = j + l * 0.1 * (1.0 - j)
    }
    j
  }

  test("textbook values match the probed DuckDB outputs") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
  }

  test("edge contract: empties, no boost below 0.7, identity") {
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0 forbids the swap match
    // common prefix but jaro 0.444 < 0.7: boost must NOT fire
    assert(jw("aXXXXX", "aYYYYY") == 0.4444444444444444)
  }

  test("fuzz: kernel equals the independent reference on 5k LCG pairs") {
    var state = 123L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    def str(): String = {
      val len = (java.lang.Long.remainderUnsigned(next(), 11)).toInt
      (0 until len).map(_ => ('a' + java.lang.Long.remainderUnsigned(next(), 5).toInt).toChar).mkString
    }
    for (_ <- 1 to 5000) {
      val (a, b) = (str(), str())
      assert(jw(a, b) == ref(a, b), s"mismatch on ('$a', '$b')")
    }
  }

  test("expression evaluates inside a DataFrame plan (codegen path)") {
    import spark.implicits._
    val got = Seq(("martha", "marhta"), ("", ""), ("abc", "abc"))
      .toDF("a", "b")
      .select(TextHashes.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.9611111111111111, 0.0, 1.0))
  }
}
