package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistable mergeable distinct-count sketches (Datasketches HLL,
  * exposed by Spark as `hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`).
  *
  * This is the incremental-aggregation scale path for COUNT DISTINCT:
  * at 100 TB you never re-scan history to refresh a distinct count —
  * you keep one ~(2^lgK)-byte sketch per (partition key) in the
  * warehouse, sketch only the new partition, and union. Unions are
  * associative/commutative and loss-free (unlike merging *estimates*,
  * which cannot be combined), so daily → monthly → all-time rollups
  * compose from the same stored column.
  *
  * The sketch column is plain `binary`, so it survives a parquet
  * round-trip — [[SketchesSpec]] pins store → read → union → estimate
  * and the union-vs-global consistency (merge-then-estimate equals
  * estimate of one global sketch over the same data).
  *
  * Accuracy is the standard HLL bound (~1.04/√2^lgK rel. std. error —
  * ~1.6% at the default lgK=12); exact twins remain the oracle-checked
  * path (`q_distinct_buyers`).
  */
object Sketches {

  /** One HLL sketch of `valueCol`'s distinct set per `groupCols` row —
    * the materialization step (store this as a binary column next to
    * the group's other aggregates).
    */
  def sketchBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
               lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Merge stored sketches up to a coarser grain and estimate:
    * `rollupCols` ⊂ the grain `sketches` was built at. Empty
    * `rollupCols` = one global estimate row.
    */
  def unionEstimate(sketches: DataFrame, rollupCols: Seq[String]): DataFrame = {
    val merged =
      if (rollupCols.isEmpty) sketches.agg(hll_union_agg(col("hll")).as("hll_m"))
      else sketches.groupBy(rollupCols.map(col): _*)
        .agg(hll_union_agg(col("hll")).as("hll_m"))
    merged.withColumn("n_distinct_est", hll_sketch_estimate(col("hll_m")))
      .drop("hll_m")
  }
}
