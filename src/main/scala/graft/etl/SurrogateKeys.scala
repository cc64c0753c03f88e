package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment (SURVEY.md §7.5).
  *
  * The reference relies on warehouse autoincrement + `RETURNING id`
  * (`ETL/user_ETL.py:114`). The deterministic, parallel replacement is
  * `row_number()` over a total order on the business key — stable
  * across runs, so re-building the warehouse converges to the same ids
  * (the property the reference gets from upsert-on-business-key).
  */
object SurrogateKeys {

  /** Dense deterministic surrogate via a global-order window.
    *
    * NOTE ON SCALE: `Window.orderBy` with no partition key plans a
    * single-partition sort — correct and fine for *dimension* tables
    * (the big side of a star schema is the fact; dims are 10^2..10^7
    * rows even at 100 TB fact scale). Never use this on a fact-sized
    * table; use [[scalable]] there.
    */
  def dense(df: DataFrame, orderBy: Seq[Column], skName: String): DataFrame =
    df.withColumn(skName, row_number().over(Window.orderBy(orderBy: _*)).cast("long"))

  /** Scalable deterministic surrogate for large inputs: range-partition
    * by the order columns (so partition i holds keys strictly before
    * partition i+1), number rows within each partition, then add the
    * per-partition offsets computed from partition sizes. Two passes
    * over the data, no single-partition bottleneck, same ids as
    * [[dense]] when the order is total.
    */
  def scalable(df: DataFrame, orderBy: Seq[Column], skName: String, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val withPid = ranged
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(orderBy: _*)))
    // Partition sizes are a tiny aggregate (one row per partition) —
    // broadcast the cumulative offsets back.
    val offsets = withPid.groupBy("__pid").count()
      .withColumn("__offset",
        coalesce(sum(col("count")).over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__offset")
    withPid.join(broadcast(offsets), "__pid")
      .withColumn(skName, (col("__offset") + col("__rn")).cast("long"))
      .drop("__pid", "__rn", "__offset")
  }
}
