package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("pruned semi-join is value-identical to a plain left-semi join") {
    val big = (1L to 1000L).map(k => (k % 97, k)).toDF("key", "payload")
    val small = Seq(3L, 5L, 7L, 11L).toDF("k")
    val got = BloomPrune.prunedSemiJoin(big, small, "key", "k", 100L)
      .as[(Long, Long)].collect().sorted
    val want = big.join(small, big("key") === small("k"), "left_semi")
      .as[(Long, Long)].collect().sorted
    assert(got.sameElements(want))
  }

  test("bloom probe actually prunes non-matching keys before the join") {
    // Disjoint key spaces: everything the probe passes is a false
    // positive; at 1% fpp on 10k probes, expect ≈100 survivors, and
    // certainly far fewer than the input — proving rows are dropped
    // pre-shuffle, not merely by the exact join.
    val big = (1L to 10000L).map(k => (k, k)).toDF("key", "payload")
    val small = (1000001L to 1000100L).toDF("k")
    val bf = small.stat.bloomFilter("k", 1000L, 0.01)
    val probe: Long => Boolean = x => bf.mightContainLong(x)
    val survivors = big.filter(udf(probe).apply(col("key"))).count()
    assert(survivors < 1000L, s"bloom passed $survivors of 10000 disjoint keys")
    // and the full operator returns the exact (empty) answer
    assert(BloomPrune.prunedSemiJoin(big, small, "key", "k", 1000L).isEmpty)
  }

  test("string keys dispatch to the string probe (no false negatives)") {
    // regression: probing string-built bloom bits with the long probe
    // hashes different bytes and silently DROPS matching rows
    val big = Seq(("k1", "a"), ("k2", "b"), ("k3", "c")).toDF("key", "payload")
    val small = Seq("k1", "k3").toDF("k")
    val got = BloomPrune.prunedSemiJoin(big, small, "key", "k", 10L)
      .select("payload").as[String].collect().sorted
    assert(got.sameElements(Array("a", "c")))
    // and mismatched key types fail loudly instead of false-negating
    intercept[IllegalArgumentException] {
      BloomPrune.prunedSemiJoin(big, Seq(1L).toDF("k"), "key", "k", 10L)
    }
  }

  test("probe plans as the codegen'd might_contain, not a scala UDF") {
    // spark.range, not a local Seq: ConvertToLocalRelation evaluates
    // filters over LocalRelation at optimize time, which would erase
    // the probe from the physical plan this test exists to pin
    val big = spark.range(1L, 101L)
      .select(col("id").as("key"), col("id").as("payload"))
    val small = Seq(3L, 5L).toDF("k")
    val plan = BloomPrune.prunedSemiJoin(big, small, "key", "k", 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"native bloom probe missing:\n$plan")
    assert(!plan.contains("UDF"), s"boxing UDF back in the probe path:\n$plan")
  }

  test("null probe keys never match") {
    val big = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (2L, "c"))
      .toDF("key", "payload")
    val small = Seq(1L).toDF("k")
    val got = BloomPrune.prunedSemiJoin(big, small, "key", "k", 10L)
      .select("payload").as[String].collect()
    assert(got.sameElements(Array("a")))
  }
}
