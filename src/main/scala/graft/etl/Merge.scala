package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based MERGE / upsert (SURVEY.md §2.1 S7): the Spark
  * re-expression of the reference's `INSERT … ON CONFLICT (bizkey)
  * DO UPDATE … RETURNING id` (`ETL/user_ETL.py:104-118`). There is no
  * mutable store here — a merge produces the next immutable snapshot,
  * which is the same converged state the reference reaches through
  * row-level upserts, with idempotence for free.
  *
  * Scale: both operations are one shuffle keyed on the business key
  * (left-anti + union, or full outer), exactly the MERGE INTO plan a
  * Delta/Iceberg sink runs; at 100 TB the snapshot is partitioned by
  * the key's hash so the join co-locates.
  */
object Merge {

  /** Last-writer-wins upsert: rows of `updates` replace same-key rows
    * of `existing`; unmatched update rows are inserts (the reference's
    * ON CONFLICT DO UPDATE). Both inputs must share a schema.
    */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(updates, keys, "left_anti").unionByName(updates)

  /** Dimension upsert with surrogate-key preservation — the RETURNING
    * semantics: existing business keys keep their surrogate (updates
    * overwrite only the attributes), new keys get fresh surrogates
    * above the current max, assigned deterministically in business-key
    * order. `existing` carries `skName`; `updates` does not.
    *
    * Duplicate business keys in `updates` are resolved first-wins on
    * `orderBy` BEFORE merging — without this, each duplicate would
    * join the existing surrogate (or mint its own) and the dimension
    * would carry repeated keys, breaking re-application convergence.
    *
    * Entirely lazy: the current max surrogate joins in as a broadcast
    * 1-row aggregate (same shape as OlapMore.division's divisor) — an
    * eager `.head()` here would run a Spark job at plan-CONSTRUCTION
    * time, once per call, before any action.
    */
  def upsertDim(existing: DataFrame, updates: DataFrame, keys: Seq[String],
                skName: String, orderBy: Seq[Column]): DataFrame = {
    val up = Dedup.firstWins(updates, keys, orderBy)
    // updates for known keys: keep the existing surrogate, take the
    // updated attributes
    val sks = existing.select((keys.map(col) :+ col(skName)): _*)
    val updatedKnown = up.join(sks, keys, "inner")
    val untouched = existing.join(up, keys, "left_anti")
    // brand-new keys: fresh surrogates above the current max. The
    // anti-joined updates are dim-cardinality (deduped on the business
    // key), so the dense window form applies (SurrogateKeys rule).
    val maxSk = existing.agg(coalesce(max(col(skName)), lit(0L)).as("__max_sk"))
    val fresh = SurrogateKeys.dense(
      up.join(existing, keys, "left_anti"), orderBy, skName)
      .crossJoin(broadcast(maxSk))
      .withColumn(skName, col(skName) + col("__max_sk"))
      .drop("__max_sk")
    untouched.unionByName(updatedKnown.select(untouched.columns.map(col): _*))
      .unionByName(fresh.select(untouched.columns.map(col): _*))
  }
}
