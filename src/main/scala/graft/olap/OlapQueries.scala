package graft.olap

import graft.etl.CleanFns
import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLAP query library over the star schema — the capability the
  * reference's warehouse exists to serve (its NextJS query layer is a
  * separate missing repo, reference `README.md:7`; SURVEY.md §2.6
  * declares the operator set we must provide).
  *
  * Determinism rules (SURVEY.md §7.0) applied to every query: total
  * ORDER BY over the output, `round(x, 4)` on every double, BIGINT
  * casts on integer outputs so the DuckDB oracle hashes identically.
  */
object OlapQueries {

  /** §7.2 spine: fact grain rebuilt from source, grouped by product
    * category, revenue per the reference's F9/F10 semantics
    * (`ETL/fact_ETL.py:56,94`: ceil2(quantity*price)).
    */
  def revenueByCategory(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_type").as("category"))
      .agg(
        round(sum(CleanFns.revenue(col("l_quantity"), col("p_retailprice"))), 4).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("category"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_revenue_by_category" -> (revenueByCategory _))

  val oracle: Map[String, String] = Map(
    "q_revenue_by_category" ->
      """SELECT p_type AS category,
        |       round(sum(ceil(l_quantity * p_retailprice * 100) / 100), 4) AS total_revenue,
        |       count(*) AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
