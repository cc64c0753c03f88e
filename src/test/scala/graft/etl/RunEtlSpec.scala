package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E1 end-to-end: one orchestrator call produces the full warehouse
  * snapshot (SURVEY.md §5.4 / reference `app.py`). Extends the
  * in-memory invariants of [[StarSchemaSpec]] to the WRITTEN snapshot:
  * row counts, FK closure across all four dims, month partitioning,
  * and rerun convergence.
  */
class RunEtlSpec extends SparkSpec {

  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("graft_etl_e2e").toString
  private lazy val stats = RunEtl.buildWarehouse(spark, sfTiny, outDir)

  test("every stage writes rows and reports positive wall-clock") {
    assert(stats.map(_.stage) ==
      Seq("dim_user", "dim_product", "dim_location", "dim_date", "fact_sales"))
    stats.foreach { s =>
      assert(s.rows > 0, s"${s.stage} wrote no rows")
      assert(s.seconds > 0)
    }
  }

  test("written fact resolves every FK against the written dims (closure)") {
    val fact = spark.read.parquet(s"$outDir/fact_sales")
    def orphans(dim: String, fk: String, sk: String): Long =
      fact.join(
        spark.read.parquet(s"$outDir/$dim").select(col(sk).as("dim_sk")),
        fact(fk) === col("dim_sk"), "left_anti").count()
    assert(orphans("dim_user", "user_sk", "user_sk") == 0)
    assert(orphans("dim_product", "product_sk", "product_sk") == 0)
    assert(orphans("dim_location", "location_sk", "location_sk") == 0)
    assert(orphans("dim_date", "date_sk", "date_sk") == 0)
  }

  test("fact snapshot is partitioned by order month") {
    val dirs = new java.io.File(s"$outDir/fact_sales").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.matches("order_month=\\d{4}-\\d{2}")))
  }

  test("rerun converges to the identical snapshot") {
    stats // force the first build
    val first = spark.read.parquet(s"$outDir/fact_sales")
      .orderBy("order_number").collect().toSeq
    val outDir2 = java.nio.file.Files.createTempDirectory("graft_etl_e2e2").toString
    RunEtl.buildWarehouse(spark, sfTiny, outDir2)
    val second = spark.read.parquet(s"$outDir2/fact_sales")
      .orderBy("order_number").collect().toSeq
    assert(first == second)
  }
}
