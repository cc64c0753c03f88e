package graft.schema

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Round-trip fidelity of the interchange formats against every
  * column type the testdata exercises: strings (with spaces),
  * longs, doubles, dates, and ns-origin timestamps. Parquet is the
  * canonical store; a format that cannot round-trip these exactly
  * must not sit at the warehouse edge.
  */
class FormatsSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("")).toSet

  private def roundTrip(df: DataFrame, tag: String): Unit = {
    val base = java.nio.file.Files.createTempDirectory(s"fmt_$tag").toString
    val schema = df.schema
    Formats.writeCsv(df, s"$base/csv")
    Formats.writeJsonl(df, s"$base/jsonl")
    Formats.writeOrc(df, s"$base/orc")
    val expected = rows(df)
    assert(rows(Formats.readCsv(spark, s"$base/csv", schema)) == expected,
      s"$tag: CSV round-trip diverged")
    assert(rows(Formats.readJsonl(spark, s"$base/jsonl", schema)) == expected,
      s"$tag: JSONL round-trip diverged")
    assert(rows(Formats.readOrc(spark, s"$base/orc", schema)) == expected,
      s"$tag: ORC round-trip diverged")
  }

  test("documents round-trip CSV/JSONL/ORC exactly (text + longs)") {
    roundTrip(Tables.documents(spark, sfTiny), "documents")
  }

  test("lineitem round-trips exactly (doubles + dates)") {
    roundTrip(Tables.lineitem(spark, sfTiny), "lineitem")
  }

  test("events round-trip exactly (micro-precision timestamps + json strings)") {
    roundTrip(Tables.events(spark, sfTiny), "events")
  }
}
