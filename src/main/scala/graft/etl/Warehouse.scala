package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Warehouse storage layout — where the 100 TB design actually lives.
  * The reference's warehouse is a row-store with upserts
  * (`config/supa.py`); the Spark-native warehouse is immutable
  * partitioned/bucketed parquet snapshots:
  *
  *  - **Partition by a coarse time/tenant column** (date month here):
  *    queries with a partition predicate read only matching
  *    directories (`PartitionFilters` in the scan — verified in
  *    WarehouseSpec), so a day query over years of fact data touches
  *    one directory, not the table.
  *  - **Bucket by the join key**: both sides of a fact⋈fact or
  *    fact⋈big-dim join bucketed on the key join WITHOUT a shuffle
  *    (no Exchange in the plan — verified in WarehouseSpec). At 100 TB
  *    the shuffle is the cost; bucketing pays it once at write time.
  *  - **Snapshot overwrite = upsert**: rewriting a partition is the
  *    idempotent MERGE (same converged state as the reference's
  *    ON CONFLICT, SURVEY.md §7.5); `Merge` handles the incremental
  *    path.
  */
object Warehouse {

  /** Write a snapshot partitioned by the given columns. Dynamic
    * partition overwrite replaces only the partitions present in `df`
    * — the partition-level upsert.
    *
    * The pre-write repartition on the partition columns is the
    * small-files guard: without it every upstream task writes a file
    * into every partition directory it touches (tasks × directories
    * files — measured 16 s for the sf0.1 fact write); clustered, each
    * directory gets one file. At larger scale add a salt column to
    * the repartition if single-partition file size exceeds the
    * row-group sweet spot.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Fact snapshot partitioned by order month (coarse enough to keep
    * directory counts sane at scale: years × 12, independent of rows).
    */
  def writeFactByMonth(fact: DataFrame, path: String): Unit =
    writePartitioned(
      fact.withColumn("order_month",
        date_format(col("date_nat_key"), "yyyy-MM")),
      path, Seq("order_month"))

  /** Compact a partitioned snapshot: rewrite `srcPath` to `destPath`
    * with AQE-rebalanced, size-bounded files per partition directory —
    * the maintenance pass for partitions that accreted small files
    * through incremental upserts (the streaming sink's foreachBatch
    * appends are the typical source).
    *
    * `REBALANCE` (AQE) both coalesces tiny shuffle blocks and splits
    * skewed ones, so hot partitions keep write parallelism — unlike a
    * plain `repartition(partitionCols)`, which funnels each directory
    * through one task. `maxRecordsPerFile` bounds the upper end.
    * Writes to a NEW path: pair with the crash-safe snapshot swap
    * ([[graft.stream.Streaming]]'s Hadoop-FS rename protocol) to
    * publish atomically.
    *
    * Partition values round-trip BYTE-EXACTLY: the read disables
    * partition-column type inference, because inference would parse a
    * directory value like `m=01` as integer 1 and rewrite the
    * compacted snapshot as `m=1` with a changed column type —
    * corrupting a maintenance pass that must be a physical no-op.
    * Partition columns therefore surface as strings in the compacted
    * snapshot, which is what directory names actually are.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, srcPath: String,
              destPath: String, partitionCols: Seq[String],
              maxRecordsPerFile: Long = 5000000L): Unit = {
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.get(inferKey)
    spark.conf.set(inferKey, "false")
    val src =
      try spark.read.parquet(srcPath)
      finally spark.conf.set(inferKey, prev)
    src.hint("rebalance", partitionCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(destPath)
  }

  /** Save as a bucketed+sorted table (catalog-managed): `buckets`
    * files per partition, co-located and pre-sorted on `keys`, so
    * joins and aggregations on `keys` skip the exchange (and the
    * sort, for sort-merge).
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
