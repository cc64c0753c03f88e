package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed exclusive prefix sum (scan) over a total order — the
  * primitive behind training-data SHARD PACKING ("fill shards to N
  * tokens in doc order"), running totals at fact scale, and offset
  * assignment, none of which may use a single-partition window
  * (CLAUDE.md scale rule).
  *
  * Shape: range-partition + in-partition sort on the order column,
  * then the classic two-pass scan — pass 1 computes per-PARTITION
  * sums (partition-count-sized driver collect, like zipWithIndex's
  * count job), pass 2 streams each partition adding its broadcast
  * exclusive offset. Both passes run on the SAME sorted RDD instance,
  * so the range partitioner's sampled boundaries are computed once
  * and reused — the RangePartitioner-seed hazard (two DAG branches
  * disagreeing) cannot occur, same argument as
  * [[SurrogateKeys.scalable]].
  */
object PrefixScan {

  /** Append `outName` = sum of `valueCol` over all rows strictly
    * before this one in `orderCol` order (exclusive prefix sum).
    * `valueCol` must be LongType; `orderCol` must be a total order
    * (unique) for a deterministic result.
    */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         outName: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType, is ${df.schema(valueCol).dataType}")
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    // null values contribute 0 — Row.getLong would NPE on a null, and
    // the oracle's window sum skips nulls, which is the same semantics
    def valOf(r: Row): Long = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
    val rdd = sorted.rdd
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.foldLeft(0L)((a, r) => a + valOf(r))))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    val schema = StructType(sorted.schema.fields :+
      StructField(outName, LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets.value(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += (if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx))
        out
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Append `outName` = max of `valueCol` over all rows strictly
    * before this one in `orderCol` order (exclusive prefix max, the
    * running-high-watermark scan) — same two-pass shape as
    * [[exclusivePrefixSum]]: per-partition maxes collect (one long per
    * partition), broadcast exclusive scan-max seeds each partition.
    * Rows before any data see `init` (callers pick an identity below
    * their value domain; 0 for epoch-µs timestamps).
    */
  def exclusivePrefixMax(df: DataFrame, orderCol: String, valueCol: String,
                         outName: String, init: Long,
                         partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType, is ${df.schema(valueCol).dataType}")
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    def valOf(r: Row): Long = if (r.isNullAt(vIdx)) init else r.getLong(vIdx)
    val rdd = sorted.rdd
    val partMaxes = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.foldLeft(init)((a, r) => math.max(a, valOf(r)))))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partMaxes.scanLeft(init)(math.max))
    val schema = StructType(sorted.schema.fields :+
      StructField(outName, LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets.value(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc = math.max(acc, valOf(r))
        out
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Shard packing: assign each row the shard index it lands in when
    * shards are filled to `capacity` units of `valueCol` in `orderCol`
    * order — `floor(exclusive_prefix / capacity)`. A row larger than
    * the remaining space starts spilling into the next shard (the
    * standard greedy token-packing semantics for sequence shards).
    */
  def packByCapacity(df: DataFrame, orderCol: String, valueCol: String,
                     capacity: Long, shardName: String = "shard"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    exclusivePrefixSum(df, orderCol, valueCol, "__prefix")
      .withColumn(shardName, floor(col("__prefix") / capacity).cast("long"))
      .drop("__prefix")
  }
}
