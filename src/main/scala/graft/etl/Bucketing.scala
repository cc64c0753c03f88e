package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins (SURVEY.md §4 "bucketing for
  * co-located joins"; build brief "repartition()/bucketing").
  *
  * Bucketing is Spark's persisted partitioning contract: a table
  * written with `bucketBy(n, key)` hash-splits every file by
  * `hash(key) % n` and records the layout in the catalog, so ANY
  * later equi-join or aggregation on `key` between tables sharing
  * the bucket count reads both sides already co-partitioned — the
  * shuffle (the dominant cost of a fact-fact join at 100 TB) is
  * elided at PLAN time, every run, forever. This is the right shape
  * for the repeated fact⋈fact joins a warehouse serves (orders ⋈
  * lineitem on orderkey here): pay one layout write, save the
  * exchange on every subsequent query. `sortBy` within buckets
  * additionally lets the sort-merge join skip its per-task sort.
  *
  * At 100 TB the bucket count is sized so one bucket of the LARGER
  * table fits an executor core's working set (thousands of buckets,
  * not this test's 4); both sides must agree on the count (Spark
  * reads `spark.sql.sources.bucketing.enabled` tables with matching
  * counts shuffle-free; mismatched counts fall back to a one-sided
  * shuffle).
  *
  * Shuffle-freedom is pinned by `BucketJoinSpec` (plan-shape assert:
  * zero ShuffleExchange under the join), not an oracle query — the
  * RESULT of a bucketed join is identical to the plain join by
  * construction; the layout contract is what needs the test.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) parquet table
    * registered in the session catalog. Single-key convenience over
    * [[Warehouse.writeBucketed]] — ONE bucketed-write implementation
    * serves both call shapes, so the layout contract (bucket count +
    * in-bucket sort + overwrite idempotence) is defined once.
    */
  def saveBucketed(df: DataFrame, table: String, key: String,
                   numBuckets: Int): Unit =
    Warehouse.writeBucketed(df, table, Seq(key), numBuckets)

  /** Equi-join two bucketed catalog tables on `key`. When both were
    * written with the same bucket count on `key`, the physical plan
    * has NO exchange on either side (the spec's assert).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Count shuffle exchanges in a frame's physical plan (descending
    * through AQE wrappers and subqueries) — the machine-checkable form
    * of "this join is co-located". Consumed by `q_bucket_join`, which
    * embeds the count in its hashed output so the layout contract is
    * driver-gated, not just spec-asserted.
    */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children ++ other.subqueries
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
