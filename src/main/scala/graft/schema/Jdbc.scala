package graft.schema

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

/** JDBC source/sink wiring (SURVEY.md §2.1 S1/S2/S5): the drop-in for
  * the reference's pooled MySQL source (`config/local.py:13-19`) and
  * TLS Postgres warehouse (`config/supa.py:14-24`) when the engine
  * runs against live databases instead of the parquet testdata.
  * No driver jars ship in this environment, so these builders are
  * exercised by compilation and option-plumbing tests only; the
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

  /** Chunked/partitioned JDBC read — S5's scalable form. */
  def reader(spark: SparkSession, url: String, table: String,
             partitionColumn: Option[String] = None,
             bounds: Option[(Long, Long)] = None,
             numPartitions: Int = 8,
             fetchSize: Int = 5000, // the reference's BATCH_SIZE default
             extraOptions: Map[String, String] = Map.empty): DataFrameReader = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", fetchSize)
    val partitioned = (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo)
        .option("upperBound", hi)
        .option("numPartitions", numPartitions)
      case _ => base
    }
    extraOptions.foldLeft(partitioned) { case (r, (k, v)) => r.option(k, v) }
  }

  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[String] = None,
           bounds: Option[(Long, Long)] = None,
           numPartitions: Int = 8): DataFrame =
    reader(spark, url, table, partitionColumn, bounds, numPartitions).load()

  /** Batched JDBC write — S2's sink (TLS via url/properties, e.g.
    * `?sslmode=require` exactly as the reference's warehouse DSN).
    * True upserts need the database's dialect (ON CONFLICT); the
    * engine-side equivalent is graft.etl.Merge + snapshot swap.
    */
  def write(df: DataFrame, url: String, table: String,
            batchSize: Int = 5000,
            mode: SaveMode = SaveMode.Append,
            extraOptions: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .mode(mode)
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
    extraOptions.foldLeft(w) { case (r, (k, v)) => r.option(k, v) }.save()
  }
}
