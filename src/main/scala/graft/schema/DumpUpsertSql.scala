package graft.schema

import java.nio.file.{Files, Paths}

/** Dumps each [[JdbcUpsert.Dialect]]'s rendered upsert statement for a
  * fixture table to JSON, so `tools/dialect_exec.py` can EXECUTE the
  * PostgreSQL string against DuckDB (which parses PG's
  * `ON CONFLICT (k) DO UPDATE SET c = EXCLUDED.c … RETURNING` natively)
  * — closing the "rendered but never run" gap for the reference's
  * actual sink dialect (`/root/reference/ETL/user_ETL.py:104-118`)
  * without a network or new dependencies. The MySQL string is dumped
  * too (no in-sandbox engine parses ON DUPLICATE KEY; it stays
  * golden-pinned in JdbcUpsertSpec).
  *
  * No SparkSession — the generators are pure; this main exists only so
  * the harness reads the REAL rendered text, never a copy.
  */
object DumpUpsertSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/upsert_sql.json")
    val cols = Seq("user_id", "name", "city")
    val keys = Seq("user_id")
    val types = Map("user_id" -> "INTEGER", "name" -> "VARCHAR(64)",
      "city" -> "VARCHAR(64)")
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val entries = Seq(
      "postgres" -> JdbcUpsert.Postgres.sql("users", cols, keys, Map.empty),
      "postgres_bind" -> JdbcUpsert.Postgres.bindColumns(cols, keys).mkString(","),
      "mysql" -> JdbcUpsert.MySql.sql("users", cols, keys, Map.empty),
      "ansi" -> JdbcUpsert.AnsiMerge().sql("users", cols, keys, types))
    val json = entries.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote $out")
  }
}
