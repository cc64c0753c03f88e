package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning: drop fact rows whose join key
  * cannot exist on the (already filtered) build side BEFORE the fact
  * shuffles — the classic shuffle-volume reducer for
  * huge-fact ⋈ selective-dim joins (the same idea Spark's AQE runtime
  * row-level filtering applies automatically when statistics allow;
  * this operator makes it explicit and composable).
  *
  * Exactness: the bloom probe admits false positives only, and the
  * exact join that follows removes them — so `prunedSemiJoin` is
  * value-identical to a plain left-semi join (oracle-verified by
  * `q_bloom_prune`). False-negative rate is zero by construction.
  *
  * Scale: the filter is built with one distributed aggregate over the
  * build side (`DataFrameStatFunctions.bloomFilter` — partial sketches
  * merged on the driver) and shipped to every task via broadcast.
  * Size the bits from the BUILD side cardinality, which for a
  * selective dim filter is orders of magnitude under the fact count:
  * 1M keys at 1% fpp ≈ 1.2 MB, 100M ≈ 120 MB (at which point prefer
  * the plain shuffle join — the operator is for small-build cases).
  * Materializing the filter is one eager job by necessity (the bits
  * must exist before the probe plan can be built) — same inherent
  * two-phase shape as broadcast variables themselves.
  */
object BloomPrune {

  /** `big` rows whose `bigKey` appears in `small.smallKey` — a
    * left-semi join with a broadcast bloom pre-filter on the probe
    * side. `expectedItems` should bound the build side's distinct key
    * count (over-estimating only wastes bits).
    */
  def prunedSemiJoin(big: DataFrame, small: DataFrame,
                     bigKey: String, smallKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // The sketch hashes the VALUE AS ITS DECLARED TYPE (putLong vs
    // putString reach different bits), so the probe must dispatch on
    // the key's type — probing string-built bits with a long (or vice
    // versa) would yield false NEGATIVES, silently dropping matches.
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    require(bigType == smallType,
      s"bloom prune needs matching key types, got $bigType vs $smallType")
    val spark = big.sparkSession
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bfBc = spark.sparkContext.broadcast(bf)
    // A scala UDF is the public seam for probing a driver-built sketch;
    // the probe is a few hash ops per row and the payoff is shuffle
    // rows avoided, so the non-codegen cost is bought back immediately.
    val probe = bigType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bfBc.value.mightContainLong(k))
          .apply(col(bigKey).cast("long"))
      case StringType =>
        udf((k: String) => k != null && bfBc.value.mightContainString(k))
          .apply(col(bigKey))
      case t => throw new IllegalArgumentException(
        s"bloom prune supports integral and string keys, got $t")
    }
    big.filter(probe)
      .join(small, big.col(bigKey) === small.col(smallKey), "left_semi")
  }
}
