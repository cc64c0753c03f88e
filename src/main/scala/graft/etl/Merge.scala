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
    */
  def upsertDim(existing: DataFrame, updates: DataFrame, keys: Seq[String],
                skName: String, orderBy: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    // updates for known keys: keep the existing surrogate, take the
    // updated attributes
    val sks = existing.select((keys.map(col) :+ col(skName)): _*)
    val updatedKnown = updates.join(sks, keys, "inner")
    val untouched = existing.join(updates, keys, "left_anti")
    // brand-new keys: fresh surrogates above the current max
    val maxSk = existing.agg(coalesce(max(col(skName)), lit(0L))).head().getLong(0)
    val fresh = SurrogateKeys.scalable(
      updates.join(existing, keys, "left_anti"), orderBy, skName)
      .withColumn(skName, col(skName) + lit(maxSk))
    untouched.unionByName(updatedKnown.select(untouched.columns.map(col): _*))
      .unionByName(fresh.select(untouched.columns.map(col): _*))
  }
}
