package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end ETL invariants on sf0.001 (SURVEY.md §5.4): row counts,
  * business-key uniqueness, referential-integrity closure, and re-run
  * convergence (the property the reference gets from
  * upsert-on-business-key idempotence, `ETL/user_ETL.py:106-114`).
  */
class StarSchemaSpec extends SparkSpec {

  test("dimensions have unique business keys and unique surrogates") {
    val u = StarSchema.userDim(spark, sfTiny).cache()
    assert(u.count() == u.select("username").distinct().count())
    assert(u.count() == u.select("user_sk").distinct().count())
    val p = StarSchema.productDim(spark, sfTiny)
    assert(p.count() == p.select("name", "brand").distinct().count())
    u.unpersist()
  }

  test("fact rows resolve every surrogate FK (P4 closure)") {
    val f = StarSchema.factWithSurrogates(spark, sfTiny).cache()
    assert(f.count() > 0)
    assert(f.filter(
      col("user_sk").isNull || col("product_sk").isNull ||
        col("location_sk").isNull || col("date_sk").isNull).count() == 0)
    // grain: one row per order_number
    assert(f.count() == f.select("order_number").distinct().count())
    f.unpersist()
  }

  test("snapshot rebuild converges (idempotence)") {
    val a = StarSchema.userDim(spark, sfTiny).orderBy("user_sk").collect().toSeq
    val b = StarSchema.userDim(spark, sfTiny).orderBy("user_sk").collect().toSeq
    assert(a == b)
  }

  test("fact surrogates reference existing dimension rows") {
    val f = StarSchema.factWithSurrogates(spark, sfTiny)
    val u = StarSchema.userDim(spark, sfTiny)
    val orphans = f.join(u, f("user_sk") === u("user_sk"), "left_anti")
    assert(orphans.count() == 0)
  }
}
