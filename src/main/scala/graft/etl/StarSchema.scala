package graft.etl

import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema builders — the Spark re-expression of the reference's
  * five ETL pipelines (SURVEY.md §3 E1-E3) over the testdata mapping
  * fixed in FIXTURES.md:
  *
  *   users→customer, products→part, location→nation⋈region,
  *   date→distinct day(o_orderdate), fact→lineitem⋈orders⋈customer⋈part.
  *
  * Each reference ETL (reflect → chunked scan → clean → dedup → upsert
  * → surrogate back-join, e.g. `ETL/user_ETL.py:61-144`) collapses to a
  * single lazy DataFrame expression: Catalyst prunes/pushes the scan,
  * the chunk loop disappears (partition-at-a-time execution is the
  * engine's job), and the upsert becomes an idempotent snapshot
  * recompute (SURVEY.md §7.5) — same converged end state.
  *
  * Scale design: dimensions are small by construction (dedup on a
  * business key), so every dim→fact join is a broadcast hash join; the
  * only big shuffles are the fact-side source joins, which AQE plans
  * (and can convert to broadcast when a side fits).
  *
  * Surrogate assignment is cardinality-class-aware: location (25
  * nations) and date (days — bounded by the calendar) are genuinely
  * dim-cardinality, so they use [[SurrogateKeys.dense]] (single-
  * partition window, no RDD hop); user (customer) and product (part)
  * SCALE WITH the fact table in TPC-H, so they use
  * [[SurrogateKeys.scalable]] (distributed sort + zipWithIndex) —
  * both forms assign the same ids over the same total order, so the
  * choice is purely physical.
  */
object StarSchema {

  /** User dimension (reference `ETL/user_ETL.py`): clean names, recode
    * the categorical column, first-wins dedup on the business key,
    * deterministic surrogate (D1+F1-F4, SURVEY.md §2).
    */
  val segmentRecode = Map(
    "BUILDING" -> "Building", "MACHINERY" -> "Industrial",
    "AUTOMOBILE" -> "Auto", "HOUSEHOLD" -> "Home")

  def userDim(spark: SparkSession, sfDir: String): DataFrame = {
    val cleaned = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("nat_key"),
      CleanFns.cleanTitle(col("c_name")).as("username"),
      CleanFns.recode(col("c_mktsegment"), segmentRecode).as("segment"),
      col("c_nationkey").cast("long").as("nationkey"),
      col("c_acctbal").as("acctbal"))
    val deduped = Dedup.firstWins(cleaned, Seq("username"), Seq(col("nat_key")))
    // customer scales WITH the fact table (TPC-H: 150k rows per SF),
    // so this dim is fact-proportional, not bounded — the distributed
    // form is required; same ids as dense on the same total order
    SurrogateKeys.scalable(deduped, Seq(col("username")), "user_sk")
  }

  /** Product dimension (reference `ETL/prod_ETL.py`): ceil-2 price
    * (F9), composite-key dedup (D3), surrogate over the business key.
    */
  def productDim(spark: SparkSession, sfDir: String): DataFrame = {
    val cleaned = Tables.part(spark, sfDir).select(
      col("p_partkey").as("nat_key"),
      CleanFns.cleanTitle(col("p_name")).as("name"),
      col("p_brand").as("brand"),
      col("p_type").as("category"),
      CleanFns.ceil2(col("p_retailprice")).as("price"))
    val deduped = Dedup.firstWins(cleaned, Seq("name", "brand"), Seq(col("nat_key")))
    // part also scales with SF (200k rows per SF) — distributed form,
    // same reasoning as userDim
    SurrogateKeys.scalable(deduped, Seq(col("name"), col("brand")), "product_sk")
  }

  /** Location dimension (reference `ETL/loc_ETL.py`): the testdata
    * stand-in is nation⋈region keyed by nation name (FIXTURES.md).
    * dropna on the address columns (P3) maps to the inner join +
    * not-null filter.
    */
  def locationDim(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    val joined = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("n_name").isNotNull && col("r_name").isNotNull)
      .select(
        col("n_nationkey").cast("long").as("nat_key"),
        CleanFns.cleanTitle(col("n_name")).as("nation"),
        CleanFns.cleanTitle(col("r_name")).as("region"))
    val deduped = Dedup.firstWins(joined, Seq("nation"), Seq(col("nat_key")))
    SurrogateKeys.dense(deduped, Seq(col("nation")), "location_sk")
  }

  /** Date dimension (reference `ETL/date_ETL.py`): distinct
    * day-truncated dates (F7+D4), surrogate ordered by the date itself
    * — the business key (`ETL/date_ETL.py:95`).
    */
  def dateDim(spark: SparkSession, sfDir: String): DataFrame = {
    val dates = Tables.orders(spark, sfDir)
      .select(CleanFns.toDay(col("o_orderdate")).as("date"))
      .filter(col("date").isNotNull)
      .distinct()
    SurrogateKeys.dense(dates, Seq(col("date")), "date_sk")
  }

  /** Fact build (reference `ETL/fact_ETL.py`): 3-way source join + the
    * derived revenue column (J1+F10), degenerate-dimension key, dedup
    * on the grain key (D5). FK resolution to surrogates (J6) is done by
    * [[factWithSurrogates]]; inner joins give the reference's
    * drop-unmatched referential-integrity semantics (P4).
    *
    * Grain: one row per (o_orderkey, l_linenumber) — printable as the
    * reference's `OrderNumber` degenerate dimension
    * (`model/FactTable.py:21`).
    */
  def factSource(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(
        col("o_orderkey"), col("l_linenumber"),
        col("l_quantity").as("quantity"),
        CleanFns.revenue(col("l_quantity"), col("p_retailprice")).as("revenue"),
        col("c_custkey").as("user_nat_key"),
        col("p_partkey").as("product_nat_key"),
        col("c_nationkey").cast("long").as("location_nat_key"),
        CleanFns.toDay(col("o_orderdate")).as("date_nat_key"))
    // D5: the reference dedups the fact batch on its grain key
    // (`ETL/fact_ETL.py:54`) — and the synthetic lineitem does repeat
    // (o_orderkey, l_linenumber). Deterministic first-wins on a total
    // tiebreak; rows tying on all tiebreak columns are identical in
    // this projection, so the survivor is well-defined either way.
    // The grain key is the raw INT pair — bijective with the printed
    // order_number, so survivors are identical, but the dedup shuffle
    // hashes/compares two longs instead of a concatenated string
    // (order_number materializes after, on the surviving rows only).
    Dedup.firstWins(joined, Seq("o_orderkey", "l_linenumber"),
        Seq(col("product_nat_key"), col("quantity"), col("revenue")))
      .select(
        concat(col("o_orderkey"), lit("-"), col("l_linenumber")).as("order_number"),
        col("quantity"), col("revenue"), col("user_nat_key"),
        col("product_nat_key"), col("location_nat_key"), col("date_nat_key"))
  }

  /** J6: remap the four natural keys to surrogates via broadcast inner
    * joins — the reference builds nat→surrogate dicts on the driver
    * (`ETL/fact_ETL.py:115-118`); a broadcast hash join IS that lookup,
    * executed distributed.
    */
  def factWithSurrogates(spark: SparkSession, sfDir: String): DataFrame =
    factFromDims(spark, sfDir, userDim(spark, sfDir), productDim(spark, sfDir),
      locationDim(spark, sfDir), dateDim(spark, sfDir))

  /** Fact build against ALREADY-BUILT dimensions — the orchestrated
    * path: RunEtl writes the dim snapshots first and passes them back
    * in, so the dim pipelines (dedup + surrogate assignment) run once
    * per warehouse build, not once per dim plus once inside the fact.
    */
  def factFromDims(spark: SparkSession, sfDir: String, userD: DataFrame,
                   productD: DataFrame, locationD: DataFrame,
                   dateD: DataFrame): DataFrame = {
    val fact = factSource(spark, sfDir)
    val u = userD.select(col("nat_key").as("u_nat"), col("user_sk"))
    val p = productD.select(col("nat_key").as("p_nat"), col("product_sk"))
    val l = locationD.select(col("nat_key").as("l_nat"), col("location_sk"))
    val d = dateD.select(col("date").as("d_nat"), col("date_sk"))
    fact
      .join(broadcast(u), col("user_nat_key") === col("u_nat"))
      .join(broadcast(p), col("product_nat_key") === col("p_nat"))
      .join(broadcast(l), col("location_nat_key") === col("l_nat"))
      .join(broadcast(d), col("date_nat_key") === col("d_nat"))
      .select(
        col("order_number"), col("quantity"), col("revenue"),
        col("user_sk"), col("product_sk"), col("location_sk"), col("date_sk"),
        // kept for the writer: Warehouse.writeFactByMonth partitions on
        // the month of the natural date (the surrogate alone can't
        // derive it without a dim join at write time)
        col("date_nat_key"))
  }
}
