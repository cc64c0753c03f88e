package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange-format readers/writers (CSV, JSON-lines, ORC) around
  * the parquet-canonical warehouse — the ingest/export seam a real
  * deployment needs at its edges (vendor drops arrive as CSV/JSONL;
  * downstream consumers ask for ORC).
  *
  * Discipline, not machinery — the wrappers exist to pin the three
  * rules that matter at 100 TB:
  *  - **Never infer schemas.** `inferSchema`/JSON sampling is a full
  *    extra pass over the input before the real read; every reader
  *    here REQUIRES an explicit [[StructType]] (schema-on-read, one
  *    pass, stable types).
  *  - **Stay splittable.** Uncompressed/gzip JSONL and CSV read fine
  *    on a laptop, but gzip is not splittable — one 10 GB .gz file is
  *    one task. Writers emit the format's default codec (snappy for
  *    ORC; plain text for CSV/JSONL, whose parallelism comes from
  *    file count — the upstream partitioning).
  *  - **Text formats are lossy by default.** CSV has no types and no
  *    nulls-vs-empty distinction without explicit options; the writer/
  *    reader pair here fixes header, null token, and timestamp format
  *    so a round-trip is bit-faithful (proven by `FormatsSpec` against
  *    every column type the testdata exercises).
  */
object Formats {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  // printable sentinel: a NUL-byte token makes the emitted CSV a
  // non-text file (C-string parsers truncate at NUL) and this source
  // file binary to diff tooling; improbable-in-data beats unprintable
  private val NullToken = "__GRAFT_NULL__"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", NullToken)
      .option("timestampFormat", TsFmt)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", NullToken)
      .option("timestampFormat", TsFmt)
      .schema(schema) // explicit: inferSchema would scan the input twice
      .csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", TsFmt)
      .json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", TsFmt)
      .schema(schema) // explicit: JSON schema sampling is an extra pass
      .json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Avro leg — the row-oriented binary interchange (Kafka/ingest
    * ecosystems): timestamps ride the timestamp-micros logical type,
    * doubles ride IEEE bits, so fidelity is the writer/reader pair's
    * to lose, and the roundtrip gate proves it doesn't. This Spark
    * build ships `AvroFileFormat` inside spark-sql but without the
    * short-name service registration, so the format is addressed by
    * class name (the documented lookup fallback).
    */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(AvroFormat).save(path)

  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(AvroFormat).load(path)

  /** XML leg (Spark 4's built-in XML source) — the worst-case TEXT
    * interchange: every value flattens to an element string, so the
    * pinned timestamp format and explicit schema are what keep the
    * round-trip exact. `rowTag` is mandatory on both sides.
    */
  def writeXml(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("rowTag", "row")
      .option("timestampFormat", TsFmt)
      .format("xml").save(path)

  def readXml(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("rowTag", "row")
      .option("timestampFormat", TsFmt)
      .schema(schema)
      .format("xml").load(path)
}
