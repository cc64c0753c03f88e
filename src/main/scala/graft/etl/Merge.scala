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

  /** SCD Type-2 merge: history-preserving dimension versioning — the
    * warehouse op one level up from [[upsertDim]]'s overwrite (SCD1).
    * `existing` carries (`keys…`, attributes, `valid_from`,
    * `valid_to`, `is_current`); `updates` carries (`keys…`,
    * attributes) all stamped `asOf`. Per business key:
    *
    *  - attribute-identical update → no-op (current row stands);
    *  - changed attributes → the current row CLOSES
    *    (`valid_to = asOf`, `is_current = false`) and a new current
    *    version opens at `asOf`;
    *  - new key → first version opens at `asOf`.
    *
    * One shuffle on the business key (the change detection is a
    * key-equi join; history rows pass through untouched), so the cost
    * profile matches `upsert` at any scale. Idempotent: re-applying
    * the same updates at the same `asOf` changes nothing (no-op rule
    * fires on the version the first application opened).
    */
  def scd2(existing: DataFrame, updates: DataFrame, keys: Seq[String],
           attrs: Seq[String], asOf: Column): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(existing.columns.toSet == (keys ++ attrs ++ meta).toSet,
      s"existing must carry $keys + $attrs + $meta, has ${existing.columns.toSeq}")
    require(updates.columns.toSet == (keys ++ attrs).toSet,
      s"updates must carry exactly $keys + $attrs, has ${updates.columns.toSeq}")
    // duplicate business keys in one batch would open two current
    // versions (same hazard upsertDim guards): first-wins on the
    // attribute ordering before merging
    val up0 = Dedup.firstWins(updates, keys, attrs.map(col))
    val history = existing.filter(!col("is_current"))
    val current = existing.filter(col("is_current"))
    // <=> (null-safe equality) per attribute: a null attribute equals
    // null, so a null→null "change" is correctly a no-op
    val same = attrs.map(a => col(a) <=> col(s"__u_$a")).reduce(_ && _)
    // explicit presence markers on both sides: attribute columns can
    // be legitimately null, so "all attrs null" must not be read as
    // "side absent" after the full outer join
    val upd = up0.select(
      (keys.map(col) ++ attrs.map(a => col(a).as(s"__u_$a")) :+
        lit(true).as("__has_upd")): _*)
    val joined = current.join(upd, keys, "full_outer")
    val hasCur = col("is_current").isNotNull // current rows carry true
    val hasUpd = col("__has_upd").isNotNull
    val unchanged = joined.filter(hasCur && (!hasUpd || same))
    val closed = joined
      .filter(hasCur && hasUpd && !same)
      .withColumn("valid_to", asOf)
      .withColumn("is_current", lit(false))
    val opened = joined
      .filter(hasUpd && (!hasCur || !same))
      .select((keys.map(col) ++ attrs.map(a => col(s"__u_$a").as(a))): _*)
      .withColumn("valid_from", asOf)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val cols = existing.columns.map(col).toIndexedSeq
    history
      .unionByName(unchanged.select(cols: _*))
      .unionByName(closed.select(cols: _*))
      .unionByName(opened.select(cols: _*))
  }
}
