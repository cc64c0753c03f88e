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
    * + sort by the order columns (a distributed total sort — partition
    * i holds keys before partition i+1), then `zipWithIndex`, which
    * runs one small count job over partition sizes and prefixes each
    * partition's offset. One materialization, no single-partition
    * bottleneck, same ids as [[dense]] on a total order.
    *
    * NOT expressed as window-over-partition-id + offset join: that
    * shape evaluates the range partitioner twice (once per DAG
    * branch), and RangePartitioner samples with an RDD-id-derived
    * seed, so the two evaluations can pick different boundaries and
    * misalign the offsets — observed as off-by-2 surrogates at sf0.01.
    * zipWithIndex sees one set of boundaries by construction, and the
    * global order (partition index × within-partition position) is
    * boundary-independent.
    */
  def scalable(df: DataFrame, orderBy: Seq[Column], skName: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        skName, org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rows, schema)
  }
}
