package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-layout guarantees: partition pruning reaches the scan,
  * bucketed joins skip the shuffle, dynamic overwrite only touches
  * written partitions.
  */
class WarehouseSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft_wh").toString

  test("partitioned fact scan prunes by partition predicate") {
    val fact = StarSchema.factSource(spark, sfTiny)
    Warehouse.writeFactByMonth(fact, s"$tmp/fact")
    val read = spark.read.parquet(s"$tmp/fact")
    val months = read.select("order_month").distinct().count()
    assert(months > 1)
    val firstMonth = read.select("order_month").orderBy("order_month")
      .first().getString(0)
    val pruned = read.filter(col("order_month") === firstMonth)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("order_month"), s"no partition filter in:\n$scan")
    // pruned partition count < full count proves directory-level skip
    assert(pruned.count() < read.count())
    assert(pruned.count() > 0)
  }

  test("dynamic partition overwrite replaces only written partitions") {
    import spark.implicits._
    val path = s"$tmp/dyn"
    Warehouse.writePartitioned(
      Seq(("a", "2024-01", 1L), ("b", "2024-02", 2L)).toDF("k", "m", "v"),
      path, Seq("m"))
    // rewrite only 2024-02
    Warehouse.writePartitioned(
      Seq(("b2", "2024-02", 99L)).toDF("k", "m", "v"), path, Seq("m"))
    val got = spark.read.parquet(path).orderBy("m")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[String]("m"))).toSeq
    assert(got == Seq(("a", "2024-01"), ("b2", "2024-02")))
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = StarSchema.factSource(spark, sfTiny)
      .select("order_number", "quantity", "revenue", "user_nat_key")
    Warehouse.writeBucketed(li, "fact_a", Seq("order_number"), 4)
    Warehouse.writeBucketed(li, "fact_b", Seq("order_number"), 4)
    // force the sort-merge path: a broadcast join would "win" here at
    // test scale and mask whether bucketing removes the exchanges
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("fact_a").join(spark.table("fact_b"), "order_number")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact collapses a small-file storm without changing the data") {
    import spark.implicits._
    val src = s"$tmp/frag"
    // simulate incremental appends: 12 tiny batches into one partition
    (1 to 12).foreach { i =>
      Seq((s"k$i", "2024-01", i.toLong)).toDF("k", "m", "v")
        .write.mode("append").partitionBy("m").parquet(src)
    }
    def parquetFiles(dir: String): Int = {
      val d = new java.io.File(s"$dir/m=2024-01")
      d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(parquetFiles(src) >= 12, "fixture did not fragment")
    val dest = s"$tmp/compacted"
    Warehouse.compact(spark, src, dest, Seq("m"))
    assert(parquetFiles(dest) < parquetFiles(src) / 2,
      s"compaction left ${parquetFiles(dest)} files")
    val a = spark.read.parquet(src).orderBy("k").collect().toSeq
    val b = spark.read.parquet(dest).orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("compact preserves partition directory values byte-exactly") {
    import spark.implicits._
    // zero-padded value: type inference would rewrite m=01 as m=1
    val src = s"$tmp/padded"
    Seq(("a", "01", 1L), ("b", "02", 2L)).toDF("k", "m", "v")
      .write.partitionBy("m").parquet(src)
    val dest = s"$tmp/padded_compacted"
    Warehouse.compact(spark, src, dest, Seq("m"))
    val dirs = new java.io.File(dest).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("m=01", "m=02"), s"partition values rewritten: $dirs")
  }
}
