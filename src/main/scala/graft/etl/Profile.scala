package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the quality gate a warehouse load runs before
  * trusting a source (the reference's only instrumentation is row
  * counters, `ETL/user_ETL.py:119`; this is the real version).
  * [[profile]] is EXACT (oracle-comparable) but its multi-column
  * countDistinct plans an Expand that replicates input ~(cols+1)× and
  * shuffles the distinct value sets — fine for dims/samples, not the
  * 100 TB path. [[approxProfile]] is the scale path: HLL sketches are
  * mergeable, so the whole profile is one map-side-combinable
  * aggregation pass regardless of table size.
  */
object Profile {

  private def checkCols(df: DataFrame, cols: Seq[String]): Unit = {
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    require(cols.forall(!_.contains("__")),
      "profiled column names must not contain '__' (alias separator)")
  }

  /** Long-format profile: one output row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** Scale-path profile: HLL approximate distinct counts (default rsd
    * ~2.3%), single combinable pass.
    */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c)))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctAgg: String => Column): DataFrame = {
    checkCols(df, cols)
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        distinctAgg(c).as(s"${c}__distinct"),
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
