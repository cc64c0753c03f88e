package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of additive aggregate snapshots — the
  * warehouse counterpart of `q_delta_dedup`'s incremental dedup: a
  * materialized `GROUP BY` is refreshed with work proportional to the
  * DELTA batch, never a fact-table rescan.
  *
  * Correctness model: additive measures (`sum`, `count` carried as a
  * sum) form a commutative monoid per group, so
  * `agg(full) = combine(agg(old), agg(delta))` exactly — integer and
  * decimal measures are associative-exact; double measures combine to
  * within partition-order float drift exactly as a direct full
  * aggregation would. `min`/`max` are semi-additive: correct under
  * INSERT-only deltas (they only tighten), wrong under deletes —
  * deletion support needs full per-group recompute of the affected
  * groups, deliberately out of scope here.
  *
  * Exactly-once: refresh is NOT idempotent (re-applying a delta
  * double-counts); a deployment pairs it with the
  * [[graft.stream.SnapshotCommitter]] swap and the streaming
  * checkpoint (at-least-once replay + committed batch id = applied
  * exactly once), the same discipline as
  * [[graft.stream.Streaming.startUpsertSink]].
  *
  * Scale: the delta is pre-aggregated map-side (partial+final hash
  * agg on the delta only), the snapshot is read back at GROUP
  * cardinality, and the combine is one key-partitioned union+agg over
  * two group-sized inputs — at 100 TB the fact table is never
  * touched.
  */
object AggMaintain {

  /** Combine an existing snapshot with a RAW delta batch. Both the
    * snapshot and the result carry `keys ++ measures` columns, where
    * every measure is an additive per-group SUM (store counts as
    * sums of 1s).
    */
  def refreshAdditive(snapshot: DataFrame, delta: DataFrame,
                      keys: Seq[String], measures: Seq[String]): DataFrame = {
    val sums = measures.map(m => sum(col(m)).as(m))
    val deltaAgg = delta
      .groupBy(keys.map(col): _*)
      .agg(sums.head, sums.tail: _*)
    snapshot.select((keys ++ measures).map(col): _*)
      .unionByName(deltaAgg.select((keys ++ measures).map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sums.head, sums.tail: _*)
  }

  /** Combine a snapshot with an insert batch AND a retraction
    * (delete) batch — the Flink-style upsert/retract stream model:
    * deleted rows enter the combine with NEGATED measures, so the
    * additive monoid subtracts them exactly; a group whose row count
    * reaches zero is DROPPED (the retraction of its last row — the
    * snapshot must not keep tombstone groups a full recompute would
    * never produce). `countMeasure` names the measure carrying the
    * per-group row count (a sum of 1s); it is what decides emptiness.
    *
    * Exactness: identical monoid argument to [[refreshAdditive]] —
    * with integer/decimal measures, subtraction is associative-exact,
    * so snapshot + inserts − deletes ≡ a full recompute of
    * (base ∪ inserts) ∖ deletes, which `q_mv_retract` hash-gates
    * against the oracle's direct aggregation. Requires deletes ⊆
    * current contents (at-most-once per row), the upstream CDC
    * contract. min/max stay out of scope exactly as in
    * [[refreshAdditive]] — retraction can loosen them, which needs a
    * per-group recompute.
    *
    * Scale: both batches pre-aggregate map-side to group grain before
    * touching the snapshot; the combine is one union+agg of three
    * group-cardinality inputs. The fact table is never rescanned.
    */
  def refreshWithRetractions(snapshot: DataFrame, inserts: DataFrame,
                             deletes: DataFrame, keys: Seq[String],
                             measures: Seq[String],
                             countMeasure: String): DataFrame = {
    require(measures.contains(countMeasure), s"$countMeasure must be a measure")
    val sums = measures.map(m => sum(col(m)).as(m))
    def agg(df: DataFrame) = df.groupBy(keys.map(col): _*)
      .agg(sums.head, sums.tail: _*)
    val negated = agg(deletes).select(
      (keys.map(col) ++ measures.map(m => (-col(m)).as(m))): _*)
    snapshot.select((keys ++ measures).map(col): _*)
      .unionByName(agg(inserts).select((keys ++ measures).map(col): _*))
      .unionByName(negated)
      .groupBy(keys.map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .filter(col(countMeasure) > 0)
  }
}
