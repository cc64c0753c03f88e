package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic key-based deduplication (SURVEY.md §2.4 D1-D5).
  *
  * The reference's `drop_duplicates(subset=key)` keeps the first row in
  * scan order (`ETL/user_ETL.py:58` et al.); Spark's `dropDuplicates`
  * keeps an *arbitrary* row, which would break oracle hash-parity. The
  * deterministic variant is a `row_number` over an explicit tiebreak
  * order — a single hash-partition shuffle on the dedup key, partial
  * aggregation on the map side is not applicable but the window runs
  * per-key so it scales with the key cardinality, not the data size.
  */
object Dedup {

  /** Keep exactly one row per key, chosen by the tiebreak order.
    * Deterministic at any scale and any partition count.
    */
  def firstWins(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Nondeterministic-but-cheap variant for pipelines where any
    * representative row is acceptable (maps to a hash aggregate, no
    * window sort).
    */
  def anyWins(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)
}
