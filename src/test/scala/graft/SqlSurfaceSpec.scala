package graft

import graft.schema.Tables
import org.apache.spark.sql.DataFrame

/** The SQL-first API surface: a user who registers the testdata as
  * views and the graft natives as SQL functions must be able to
  * reproduce the declared queries in pure `spark.sql` — pinned by
  * value-comparing a SQL rendition against its oracle-verified
  * DataFrame twin, one representative query per pack (ETL fact build,
  * OLAP rollup / grouping sets / windows / distinct, text hashing via
  * [[graft.functions.GraftExtensions]], token accounting, and vector
  * search via the registered `graft_dot` native).
  *
  * Same-engine comparisons: the SQL rendition evaluates the identical
  * Catalyst expressions the DataFrame builds, so results (including
  * float folds through the registered natives) must match exactly —
  * any drift means the SQL surface and Column API have diverged.
  */
class SqlSurfaceSpec extends SparkSpec {

  /** Register every testdata table under its natural name plus the
    * graft native SQL functions — the session a SQL-first user sees.
    */
  private lazy val sqlSession = {
    graft.functions.GraftExtensions.register(spark)
    Seq("region" -> Tables.region _, "nation" -> Tables.nation _,
        "customer" -> Tables.customer _, "part" -> Tables.part _,
        "orders" -> Tables.orders _, "lineitem" -> Tables.lineitem _,
        "documents" -> Tables.documents _, "embeddings" -> Tables.embeddings _)
      .foreach { case (name, load) =>
        load(spark, sfTiny).createOrReplaceTempView(name)
      }
    spark
  }

  private def assertSqlMatches(sql: String, df: DataFrame): Unit = {
    val viaSql = sqlSession.sql(sql).collect().toSeq
    val viaDf = df.collect().toSeq
    assert(viaSql.nonEmpty, "vacuous comparison: SQL rendition returned 0 rows")
    assert(viaSql == viaDf)
  }

  test("pure-SQL snapshot checksum matches the DataFrame query (graft_poly_hash)") {
    assertSqlMatches(
      """SELECT source, count(*) AS n_docs,
        |       CAST(bit_xor(graft_poly_hash(
        |         concat_ws('|', CAST(doc_id AS STRING), lang, text))) AS BIGINT)
        |         AS xor_hash,
        |       min(graft_poly_hash(concat_ws('|', CAST(doc_id AS STRING), lang, text)))
        |         AS min_hash,
        |       max(graft_poly_hash(concat_ws('|', CAST(doc_id AS STRING), lang, text)))
        |         AS max_hash
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      text.CorpusOps.srcChecksum(spark, sfTiny))
  }

  test("pure-SQL revenue-by-category matches the DataFrame OLAP query") {
    assertSqlMatches(
      """SELECT p_type AS category,
        |       round(sum(ceil(l_quantity * p_retailprice * 100) / 100), 4)
        |         AS total_revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
      olap.OlapQueries.revenueByCategory(spark, sfTiny))
  }

  /** Shared geography-joined order base for rollup / grouping sets. */
  private val revenueBase =
    """SELECT r_name AS region, n_name AS nation, c_mktsegment AS segment,
      |       ceil(l_quantity * p_retailprice * 100) / 100 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |              JOIN part ON l_partkey = p_partkey
      |              JOIN customer ON o_custkey = c_custkey
      |              JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey""".stripMargin

  test("pure-SQL ROLLUP matches the DataFrame OLAP query") {
    assertSqlMatches(
      s"""SELECT coalesce(region, 'ALL') AS region,
         |       coalesce(nation, 'ALL') AS nation,
         |       coalesce(segment, 'ALL') AS segment,
         |       CAST(grouping_id() AS BIGINT) AS gid,
         |       round(sum(revenue), 4) AS total_revenue,
         |       count(*) AS n_items
         |FROM ($revenueBase)
         |GROUP BY ROLLUP(region, nation, segment)
         |ORDER BY gid, region, nation, segment""".stripMargin,
      olap.OlapQueries.revenueRollup(spark, sfTiny))
  }

  test("pure-SQL GROUPING SETS matches the DataFrame OLAP query") {
    assertSqlMatches(
      """SELECT coalesce(region, 'ALL') AS region,
        |       coalesce(segment, 'ALL') AS segment,
        |       CAST(grouping_id() AS BIGINT) AS gid,
        |       round(sum(price), 4) AS total_price,
        |       count(*) AS n_orders
        |FROM (SELECT r_name AS region, c_mktsegment AS segment,
        |             o_totalprice AS price
        |      FROM orders JOIN customer ON o_custkey = c_custkey
        |                  JOIN nation ON c_nationkey = n_nationkey
        |                  JOIN region ON n_regionkey = r_regionkey)
        |GROUP BY GROUPING SETS ((region), (segment), ())
        |ORDER BY gid, region, segment""".stripMargin,
      olap.OlapMore.groupingSets(spark, sfTiny))
  }

  test("pure-SQL ranking window matches the DataFrame OLAP query") {
    assertSqlMatches(
      """SELECT * FROM (
        |  SELECT p_type AS category, p_partkey, count(*) AS n_sold,
        |         CAST(rank() OVER (PARTITION BY p_type
        |                           ORDER BY count(*) DESC, p_partkey) AS BIGINT) AS rnk
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |WHERE rnk <= 3 ORDER BY category, rnk, p_partkey""".stripMargin,
      olap.OlapQueries.windowRank(spark, sfTiny))
  }

  test("pure-SQL frame window (running total) matches the DataFrame OLAP query") {
    assertSqlMatches(
      """WITH m AS (
        |  SELECT date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS month,
        |         sum(o_totalprice) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT month, round(rev, 4) AS monthly_revenue,
        |       round(sum(rev) OVER (ORDER BY month
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |         AS running_total
        |FROM m ORDER BY month""".stripMargin,
      olap.OlapQueries.runningTotal(spark, sfTiny))
  }

  test("pure-SQL exact distinct matches the DataFrame OLAP query") {
    assertSqlMatches(
      """SELECT n_name AS nation, count(DISTINCT o_custkey) AS n_buyers,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
      olap.OlapQueries.distinctBuyers(spark, sfTiny))
  }

  test("pure-SQL token accounting matches the DataFrame text query") {
    assertSqlMatches(
      s"""SELECT source, count(*) AS n_docs,
         |       CAST(sum(size(regexp_extract_all(text, '${text.TextFns.bpeTokenRegex}', 0))) AS BIGINT)
         |         AS total_tokens,
         |       CAST(max(size(regexp_extract_all(text, '${text.TextFns.bpeTokenRegex}', 0))) AS BIGINT)
         |         AS max_tokens
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      text.TextQueries.tokenCount(spark, sfTiny))
  }

  test("pure-SQL cosine top-k matches the DataFrame vector query (graft_dot)") {
    assertSqlMatches(
      """WITH e0 AS (SELECT vec_id, label,
        |                   transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |            FROM embeddings),
        |     e AS (SELECT vec_id, label, v, sqrt(graft_dot(v, v)) AS nrm FROM e0),
        |     p AS (SELECT v AS pv, nrm AS pnrm FROM e WHERE vec_id = 0),
        |     s AS (SELECT vec_id, label, graft_dot(v, pv) / (nrm * pnrm) AS sim0
        |           FROM e CROSS JOIN p WHERE vec_id <> 0)
        |SELECT vec_id, label, floor(sim0 * 10000.0D + 0.5D) / 10000.0D AS sim
        |FROM s ORDER BY sim0 DESC, vec_id LIMIT 10""".stripMargin,
      vector.VectorQueries.knn(spark, sfTiny))
  }

  test("pure-SQL star-schema fact build matches the DataFrame ETL query") {
    // the full J1+F10+P4+D5+J6 pipeline as one SQL statement: dedup'd
    // dims with surrogate assignment (row_number over the dedup key —
    // the single-partition SQL rendition of SurrogateKeys; fine at
    // spec scale, the library path is the scalable one), grain-dedup'd
    // fact source, and the 4-way surrogate back-join
    assertSqlMatches(
      """WITH u AS (
        |  SELECT nat_key, username,
        |         CAST(row_number() OVER (ORDER BY username) AS BIGINT) AS user_sk
        |  FROM (SELECT c_custkey AS nat_key, initcap(trim(c_name)) AS username,
        |               row_number() OVER (PARTITION BY initcap(trim(c_name))
        |                                  ORDER BY c_custkey) AS rn
        |        FROM customer) WHERE rn = 1),
        |p AS (
        |  SELECT nat_key, name, brand,
        |         CAST(row_number() OVER (ORDER BY name, brand) AS BIGINT) AS product_sk
        |  FROM (SELECT p_partkey AS nat_key, initcap(trim(p_name)) AS name,
        |               p_brand AS brand,
        |               row_number() OVER (PARTITION BY initcap(trim(p_name)), p_brand
        |                                  ORDER BY p_partkey) AS rn
        |        FROM part) WHERE rn = 1),
        |l AS (
        |  SELECT nat_key,
        |         CAST(row_number() OVER (ORDER BY nation) AS BIGINT) AS location_sk
        |  FROM (SELECT CAST(n_nationkey AS BIGINT) AS nat_key,
        |               initcap(trim(n_name)) AS nation,
        |               row_number() OVER (PARTITION BY initcap(trim(n_name))
        |                                  ORDER BY n_nationkey) AS rn
        |        FROM nation JOIN region ON n_regionkey = r_regionkey
        |        WHERE n_name IS NOT NULL AND r_name IS NOT NULL) WHERE rn = 1),
        |d AS (
        |  SELECT d AS date,
        |         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS date_sk
        |  FROM (SELECT DISTINCT to_date(o_orderdate) AS d
        |        FROM orders WHERE o_orderdate IS NOT NULL)),
        |f AS (
        |  SELECT order_number, quantity, revenue, user_nat_key,
        |         product_nat_key, location_nat_key, date_nat_key
        |  FROM (SELECT *, row_number() OVER (PARTITION BY order_number
        |                  ORDER BY product_nat_key, quantity, revenue) AS rn
        |        FROM (SELECT o_orderkey || '-' || l_linenumber AS order_number,
        |                     l_quantity AS quantity,
        |                     ceil(l_quantity * p_retailprice * 100) / 100 AS revenue,
        |                     c_custkey AS user_nat_key,
        |                     p_partkey AS product_nat_key,
        |                     CAST(c_nationkey AS BIGINT) AS location_nat_key,
        |                     to_date(o_orderdate) AS date_nat_key
        |              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |                            JOIN part ON l_partkey = p_partkey
        |                            JOIN customer ON o_custkey = c_custkey))
        |  WHERE rn = 1)
        |SELECT f.order_number, round(f.quantity, 4) AS quantity,
        |       round(f.revenue, 4) AS revenue,
        |       u.user_sk, p.product_sk, l.location_sk, d.date_sk
        |FROM f JOIN u ON f.user_nat_key = u.nat_key
        |       JOIN p ON f.product_nat_key = p.nat_key
        |       JOIN l ON f.location_nat_key = l.nat_key
        |       JOIN d ON f.date_nat_key = d.date
        |ORDER BY f.order_number""".stripMargin,
      etl.EtlQueries.factBuild(spark, sfTiny))
  }
}
