package graft

import graft.schema.Tables
import org.apache.spark.sql.functions._

/** The SQL-first API surface: a user who registers the testdata as
  * views and the graft natives as SQL functions must be able to
  * reproduce the declared queries in pure `spark.sql` — pinned by
  * value-comparing a SQL rendition against its oracle-verified
  * DataFrame twin.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("pure-SQL snapshot checksum matches the DataFrame query") {
    graft.functions.GraftExtensions.register(spark)
    Tables.documents(spark, sfTiny).createOrReplaceTempView("documents_v")
    val sql = spark.sql(
      """SELECT source, count(*) AS n_docs,
        |       CAST(bit_xor(graft_poly_hash(
        |         concat_ws('|', CAST(doc_id AS STRING), lang, text))) AS BIGINT)
        |         AS xor_hash,
        |       min(graft_poly_hash(concat_ws('|', CAST(doc_id AS STRING), lang, text)))
        |         AS min_hash,
        |       max(graft_poly_hash(concat_ws('|', CAST(doc_id AS STRING), lang, text)))
        |         AS max_hash
        |FROM documents_v GROUP BY source ORDER BY source""".stripMargin)
      .collect().toSeq
    val df = text.CorpusOps.srcChecksum(spark, sfTiny).collect().toSeq
    assert(sql == df)
  }

  test("pure-SQL rollup matches the DataFrame OLAP query") {
    Tables.lineitem(spark, sfTiny).createOrReplaceTempView("lineitem_v")
    Tables.part(spark, sfTiny).createOrReplaceTempView("part_v")
    val sql = spark.sql(
      """SELECT p_type AS category,
        |       round(sum(ceil(l_quantity * p_retailprice * 100) / 100), 4)
        |         AS revenue,
        |       count(*) AS n_items
        |FROM lineitem_v JOIN part_v ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin)
      .collect().toSeq
    val df = olap.OlapQueries.revenueByCategory(spark, sfTiny).collect().toSeq
    assert(sql == df)
  }
}
