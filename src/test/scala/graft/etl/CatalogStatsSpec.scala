package graft.etl

import graft.SparkSpec

/** The catalog-statistics round-trip beyond `q_catalog_stats`'s exact
  * fields: the HLL distinct estimate and the stored EQUI-HEIGHT
  * HISTOGRAM (the optimizer statistic q_equidepth_hist computes by
  * hand) must land in the catalog and read back — engine-specific
  * numbers no cross-engine oracle can gate, pinned here instead.
  */
class CatalogStatsSpec extends SparkSpec {

  test("ANALYZE stores distinct counts and an equi-height histogram in the catalog") {
    val prev = spark.conf.getOption("spark.sql.statistics.histogram.enabled")
    try {
      spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_stats_spec")
      spark.sql("CREATE TABLE graft_stats_spec USING parquet " +
        s"OPTIONS (path '$sfTiny/orders.parquet')")
      spark.sql("ANALYZE TABLE graft_stats_spec COMPUTE STATISTICS " +
        "FOR COLUMNS o_totalprice, o_custkey")
      val kv = spark.sql("DESCRIBE EXTENDED graft_stats_spec o_totalprice")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val exactDistinct = spark.read.parquet(s"$sfTiny/orders.parquet")
        .select("o_totalprice").distinct().count()
      val est = kv("distinct_count").toLong
      assert(est > 0 && math.abs(est - exactDistinct).toDouble / exactDistinct < 0.15,
        s"HLL distinct $est vs exact $exactDistinct")
      // the histogram lands as "height: <rows/bin>, num_of_bins: <n>"
      // plus one line per bin
      val hist = kv.getOrElse("histogram", "NULL")
      assert(hist != "NULL" && hist.contains("num_of_bins"),
        s"no histogram in catalog: $hist")
      val bins = kv.keys.count(_.startsWith("bin_"))
      assert(bins > 0, s"no bin rows in DESCRIBE output: ${kv.keys.toSeq.sorted.take(8)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_stats_spec")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.statistics.histogram.enabled", v)
        case None => spark.conf.unset("spark.sql.statistics.histogram.enabled")
      }
    }
  }
}
