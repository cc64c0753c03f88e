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
    * weighted means all derive from sums and counts). The salt is a
    * DETERMINISTIC function of every column in the row: a task retried
    * after a fetch failure recomputes the identical salt assignment,
    * so no row can be double-counted in one salt group and lost from
    * another when some reducers already consumed the old map output
    * (the indeterminate-shuffle hazard of partition-id/row-id salts).
    * The trade-off is that fully-identical rows share a salt — a hot
    * key whose rows are byte-identical still funnels to one reducer.
    * That case is the map-side combiner's job anyway (identical rows
    * pre-aggregate perfectly); salting targets hot keys with VARYING
    * payloads, which xxhash64 over all columns spreads uniformly.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salt: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val phase1 = df
      .withColumn("__salt", pmod(
        xxhash64(df.columns.map(col).toIndexedSeq: _*),
        lit(salt.toLong)))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
