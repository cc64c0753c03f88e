package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D1-D5 deterministic dedup + surrogate-key assignment invariants
  * (SURVEY.md §5.2-5.3).
  */
class DedupSurrogateSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    ("b", 3, "x3"), ("a", 2, "x2"), ("a", 1, "x1"), ("c", 5, "x5"), ("b", 4, "x4"))
    .toDF("k", "tie", "payload")

  test("firstWins keeps exactly the lowest-tiebreak row per key (D1)") {
    val got = Dedup.firstWins(sample, Seq("k"), Seq(col("tie")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("a", 1), ("b", 3), ("c", 5)))
  }

  test("firstWins is deterministic under repartitioning") {
    val shuffled = sample.repartition(7, col("payload"))
    val a = Dedup.firstWins(sample, Seq("k"), Seq(col("tie"))).orderBy("k").collect().toSeq
    val b = Dedup.firstWins(shuffled, Seq("k"), Seq(col("tie"))).orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("dense surrogates are 1..n in business-key order") {
    val dim = Dedup.firstWins(sample, Seq("k"), Seq(col("tie")))
    val got = SurrogateKeys.dense(dim, Seq(col("k")), "sk")
      .orderBy("sk").collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(got == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("lastWins is firstWins on the reversed order, via a windowless aggregate") {
    // the law that makes the struct-max implementation trustworthy:
    // lastWins(ord asc) must pick exactly the row firstWins picks
    // under the descending tiebreak — and stay deterministic under
    // repartitioning (mergeable aggregate, no window)
    val df = Seq(
      ("k1", 1L, "a"), ("k1", 3L, "b"), ("k1", 2L, "c"),
      ("k2", 5L, "d"), ("k2", 5L, "e"),  // ord tie -> payload breaks it
      ("k3", 9L, "f")).toDF("k", "ord", "v")
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "v").orderBy("k").collect().toSeq
    val last = norm(Dedup.lastWins(df.repartition(7),
      Seq("k"), Seq(col("ord"), col("v")), Seq("v")))
    val firstOnRev = norm(Dedup.firstWins(df,
      Seq("k"), Seq(col("ord").desc, col("v").desc)).select("k", "v"))
    assert(last == firstOnRev)
    assert(last.map(_.get(1)) == Seq("b", "e", "f"))
  }

  test("scalable surrogates equal dense surrogates on the same order") {
    val df = (1 to 1000).map(i => (s"key_${1000 - i}", i)).toDF("k", "v")
    val dense = SurrogateKeys.dense(df, Seq(col("k")), "sk")
      .select("k", "sk").orderBy("k").collect().toSeq
    val scal = SurrogateKeys.scalable(df, Seq(col("k")), "sk", partitions = 8)
      .select("k", "sk").orderBy("k").collect().toSeq
    assert(dense == scal)
  }
}
