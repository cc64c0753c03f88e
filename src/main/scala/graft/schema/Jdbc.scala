package graft.schema

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink wiring (SURVEY.md §2.1 S1/S2/S5): the drop-in for
  * the reference's pooled MySQL source (`config/local.py:13-19`) and
  * TLS Postgres warehouse (`config/supa.py:14-24`) when the engine
  * runs against live databases instead of the parquet testdata.
  * No driver jars ship in this environment, so the option-building is
  * factored into pure functions covered by JdbcSpec; the load/save
  * semantics are Spark's stock JDBC source.
  *
  * Scale mapping of the reference's hand-built streaming scan
  * (`ETL/user_ETL.py:71-96`, 5000-row server cursor):
  * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` split
  * the table into parallel range scans (one per task — the real
  * distributed version of the chunk loop) and `fetchsize` is the
  * per-round-trip row batch. Connection pooling is per-executor and
  * handled by the JDBC driver/DataSource; `pushDownPredicate` (on by
  * default) sends filters into the database like the reference's
  * pushed-down projections.
  */
object Jdbc {

  /** Pure option map for a partitioned JDBC read — S5's scalable
    * form. Fails loudly when only half of the partitioning spec is
    * given: silently degrading to a single-connection full-table
    * scan is the exact failure mode this module exists to prevent.
    */
  def readOptions(url: String, table: String,
                  partitionColumn: Option[String] = None,
                  bounds: Option[(Long, Long)] = None,
                  numPartitions: Int = 8,
                  fetchSize: Int = 5000, // the reference's BATCH_SIZE default
                  extraOptions: Map[String, String] = Map.empty): Map[String, String] = {
    require(partitionColumn.isDefined == bounds.isDefined,
      "partitionColumn and bounds must be supplied together " +
        "(a half-specified split silently degrades to one serial scan)")
    val base = Map(
      "url" -> url,
      "dbtable" -> table,
      "fetchsize" -> fetchSize.toString)
    val partitioned = (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) => Map(
        "partitionColumn" -> c,
        "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString,
        "numPartitions" -> numPartitions.toString)
      case _ => Map.empty[String, String]
    }
    base ++ partitioned ++ extraOptions
  }

  /** Pure option map for a batched JDBC write — S2's sink (TLS via
    * url/properties, e.g. `?sslmode=require` exactly as the
    * reference's warehouse DSN). True upserts need the database's
    * dialect (ON CONFLICT); the engine-side equivalent is
    * graft.etl.Merge + snapshot swap.
    */
  def writeOptions(url: String, table: String,
                   batchSize: Int = 5000,
                   extraOptions: Map[String, String] = Map.empty): Map[String, String] =
    Map("url" -> url, "dbtable" -> table,
      "batchsize" -> batchSize.toString) ++ extraOptions

  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[String] = None,
           bounds: Option[(Long, Long)] = None,
           numPartitions: Int = 8): DataFrame =
    spark.read.format("jdbc")
      .options(readOptions(url, table, partitionColumn, bounds, numPartitions))
      .load()

  def write(df: DataFrame, url: String, table: String,
            batchSize: Int = 5000,
            mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc")
      .mode(mode)
      .options(writeOptions(url, table, batchSize))
      .save()
}
