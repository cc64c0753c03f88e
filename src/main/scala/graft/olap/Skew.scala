package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys (SURVEY.md §4 / build
  * brief "salting for skew").
  *
  * AQE's skew-join splitting handles skewed JOINS automatically, but a
  * hash AGGREGATE with one hot key still funnels that key's rows into
  * a single reducer. Salting splits each key across `salt` reducers in
  * a first partial aggregate, then merges the ≤salt partials per key —
  * the hot reducer's input drops by ~salt×, at the cost of one extra
  * (tiny) shuffle stage. Worth it only for algebraic aggregates
  * (sum/count/min/max — avg composes as sum/count) and only when the
  * key histogram is actually skewed; for uniform keys Spark's
  * map-side partial aggregation already does this work for free.
  */
object Skew {

  /** Salted sum+count per key (the building block — avg, rates, and
    * weighted means all derive from sums and counts). The salt mixes
    * the partition id and a per-row id so a hot key splits even when
    * its VALUE column is constant (counter-style skew, the textbook
    * case — a value-only hash would map every such row to one salt
    * and change nothing). Row placement in salts is therefore not
    * run-stable, which is fine: integer sums/counts are
    * order-independent, and float sums are already order-dependent
    * under any parallel aggregation.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salt: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val phase1 = df
      .withColumn("__salt", pmod(
        hash(col(valueCol), spark_partition_id(), monotonically_increasing_id()),
        lit(salt)))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
