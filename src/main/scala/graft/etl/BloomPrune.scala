package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
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
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    require(bigType == smallType,
      s"bloom prune needs matching key types, got $bigType vs $smallType")
    // The probe is Spark's own codegen'd `BloomFilterMightContain` —
    // the same expression AQE's runtime row-level filtering injects —
    // so the per-row check stays inside whole-stage codegen (the old
    // scala UDF boxed every key; see BloomPruneSpec's UDF cross-check).
    // The native expression probes LONGs only, so both sides agree on
    // a key→long mapping first: integral keys cast directly (putLong
    // bits match mightContainLong), strings go through xxhash64 — a
    // hash collision adds only false POSITIVES, which the exact join
    // removes; false negatives stay impossible by construction.
    // The key name is passed EXPLICITLY (round-12 advice): dispatching
    // on reference equality (`df eq big`) silently built the bloom
    // over the wrong column when a caller passed the same DataFrame
    // instance as both sides (self semi-join) — the false-NEGATIVE
    // silent-row-drop failure this operator must never have.
    val keyToLong: (DataFrame, String) => Column = bigType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (df, k) => df.col(k).cast("long")
      case StringType =>
        (df, k) => xxhash64(df.col(k))
      case t => throw new IllegalArgumentException(
        s"bloom prune supports integral and string keys, got $t")
    }
    val bf = small.select(keyToLong(small, smallKey).as("_k")).stat
      .bloomFilter("_k", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    // The serialized bits ride the plan as a BinaryType literal (the
    // constant shape BloomFilterMightContain requires; Spark's own
    // injected filter uses a scalar subquery over the same expression).
    // Size guidance unchanged: ~1.2 MB per 1M keys at 1% fpp — for
    // build sides where that literal would be large, prefer the plain
    // shuffle join.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val probe = ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes, BinaryType),
        ColumnBridge.expression(keyToLong(big, bigKey))))
    big.filter(probe)
      .join(small, big.col(bigKey) === small.col(smallKey), "left_semi")
  }
}
