package graft.olap

import graft.SparkSpec
import graft.etl.SurrogateKeys
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves the distributed-rank ntile ([[OlapMore.ntileByRank]] over a
  * [[SurrogateKeys.scalable]] rank) is row-for-row identical to
  * Spark's own `ntile(k)` window — including the ragged cases where n
  * is not divisible by k (the first n mod k buckets hold one extra
  * row). This is what licenses q_ntile running without a
  * single-partition window at ANY table size.
  */
class NtileFormulaSpec extends SparkSpec {
  import spark.implicits._

  private def check(n: Int, k: Int): Unit = {
    // a shuffled value column so rank != input order, with duplicate
    // values so the id tie-break matters
    val df = (0 until n).map(i => ((i * 131071) % 97, i.toLong))
      .toDF("v", "id")
    val viaWindow = df
      .withColumn("t", ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "t")
    val ranked = SurrogateKeys.scalable(df, Seq(col("v"), col("id")), "rk")
    val viaFormula = ranked
      .withColumn("t", OlapMore.ntileByRank("rk", n.toLong, k.toLong))
      .select("id", "t")
    val w = viaWindow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f = viaFormula.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == w, s"n=$n k=$k: formula diverged from ntile window")
  }

  test("ntileByRank matches ntile(k) for divisible and ragged n") {
    for (n <- Seq(1, 2, 3, 4, 5, 7, 8, 37, 100, 101, 102, 103); k <- Seq(2, 4))
      check(n, k)
  }

  test("ntileByRank matches ntile for n smaller than k") {
    check(3, 4)
    check(1, 4)
    check(2, 5)
  }

  test("ntileQuartiles runs NO data job at plan-construction time") {
    // the total-count must join in lazily (broadcast 1-row cross join,
    // the division/nRegions pattern) and the rank must come from the
    // lazy radix shape — an eager .count() or zipWithIndex would run a
    // distributed job over the DATA the moment the query function is
    // CALLED. The only jobs schema-on-read construction may launch are
    // parquet footer reads (every `spark.read.parquet` resolution runs
    // one; metadata-sized, not data-sized).
    val stages = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.stageInfos.foreach(si => stages.add(si.name))
    }
    // flush in-flight events from earlier tests FIRST — the async bus
    // delivers queued events to listeners added after the post, so a
    // stale jobStart from the previous test would false-positive here
    org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      OlapMore.ntileQuartiles(spark, sfTiny)
      // an eager action would have BLOCKED through its job, so its
      // start event is already enqueued — a synchronous drain observes it
      org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)
      val dataJobs = stages.toArray(Array.empty[String])
        .filterNot(_.contains("parquet at"))
      assert(dataJobs.isEmpty,
        s"plan construction launched data job stage(s): ${dataJobs.mkString("; ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
