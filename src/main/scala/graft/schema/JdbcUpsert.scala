package graft.schema

import org.apache.spark.sql.{DataFrame, Row}

/** DB-side upsert execution (SURVEY.md §2.1 S7) — the reference's
  * `INSERT … ON CONFLICT (bizkey) DO UPDATE SET … `
  * (`ETL/user_ETL.py:104-118`) executed against a live database, which
  * Spark's stock JDBC sink cannot do (append/overwrite only).
  *
  * Design: one pure SQL generator per dialect (unit-testable with no
  * database) plus a partition-parallel executor — each partition opens
  * its own connection and runs the statement in `batchSize` batches
  * with a commit per batch, exactly the reference's chunked
  * commit-per-batch loop (`ETL/user_ETL.py:91-117`) but running on
  * every executor in parallel instead of one driver thread. At 1000
  * executors the database's write throughput is the bottleneck by
  * design; `df.coalesce(n)` upstream is the knob for connection count.
  *
  * Key return (the reference's `RETURNING id, bizkey`): JDBC batches
  * cannot return result sets portably — the engine-side equivalent is
  * the back-join on business key after the upsert
  * ([[graft.etl.Merge.upsertDim]] reproduces RETURNING semantics), or
  * a second `Jdbc.read` of (id, bizkey), which the database serves
  * from the primary-key index.
  *
  * Execution proof per dialect:
  *  - `AnsiMerge`: integration-proven against embedded Derby (real
  *    JDBC round-trip, JdbcUpsertSpec).
  *  - `Postgres`: the RENDERED string (via [[DumpUpsertSql]], never a
  *    copy) is executed against DuckDB — which parses PG's
  *    `ON CONFLICT … DO UPDATE SET c = EXCLUDED.c` and `RETURNING`
  *    natively — by `tools/dialect_exec.py`: fresh insert,
  *    conflict-update, RETURNING on both arms, idempotent replay.
  *  - `MySql`: SQL-generation-proven only (golden statement + the
  *    bind-layout/placeholder-count law, JdbcUpsertSpec). No engine
  *    in the offline sandbox parses `ON DUPLICATE KEY` (the cache
  *    ships only Derby; H2/HSQLDB/SQLite don't resolve, zero egress
  *    — investigated round 10). First thing on a machine with a real
  *    MySQL: point JdbcUpsertSpec's round-trip test at it with
  *    `MySql` — the executor path is dialect-agnostic, only
  *    `sql`/`bindColumns` swap.
  */
object JdbcUpsert {

  /** A dialect renders one parameterized upsert statement for
    * (table, cols, keys) and declares which column each `?` binds, in
    * statement order — INSERT-style dialects bind each column once,
    * MERGE-style dialects re-bind columns where they recur in the
    * ON / UPDATE / INSERT clauses. `sqlType` supplies per-column SQL
    * types for dialects whose parser needs typed parameter markers
    * (ANSI MERGE).
    */
  sealed trait Dialect {
    def sql(table: String, cols: Seq[String], keys: Seq[String],
            sqlType: Map[String, String] = Map.empty): String

    /** Column name for each `?` in [[sql]], in order. */
    def bindColumns(cols: Seq[String], keys: Seq[String]): Seq[String] = cols

    protected def nonKeys(cols: Seq[String], keys: Seq[String]): Seq[String] = {
      require(keys.nonEmpty && keys.forall(cols.contains),
        s"keys $keys must be a subset of columns $cols")
      cols.filterNot(keys.contains)
    }
  }

  /** PostgreSQL 9.5+: `ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`
    * — the reference's exact statement shape (`ETL/user_ETL.py:106-114`).
    * All-key rows degrade to `DO NOTHING` (nothing to update).
    */
  case object Postgres extends Dialect {
    def sql(table: String, cols: Seq[String], keys: Seq[String],
            sqlType: Map[String, String]): String = {
      val upd = nonKeys(cols, keys)
      val action =
        if (upd.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " + upd.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${keys.mkString(", ")}) $action"
    }
  }

  /** MySQL/MariaDB: `ON DUPLICATE KEY UPDATE c = VALUES(c)` — the
    * conflict key is whatever unique index the table declares, so
    * `keys` only validates the update-column split here.
    */
  case object MySql extends Dialect {
    def sql(table: String, cols: Seq[String], keys: Seq[String],
            sqlType: Map[String, String]): String = {
      val upd = nonKeys(cols, keys)
      // an all-key table still needs one assignment to be valid SQL;
      // k = k is the standard no-op form
      val sets =
        if (upd.isEmpty) keys.take(1).map(k => s"$k = $k")
        else upd.map(c => s"$c = VALUES($c)")
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON DUPLICATE KEY UPDATE ${sets.mkString(", ")}"
    }
  }

  /** SQL:2003 `MERGE INTO … USING <one-row dummy table>` — the form
    * Derby and DB2 accept (`SYSIBM.SYSDUMMY1`; Oracle: `DUAL`). These
    * parsers reject a parameterized `VALUES` source and untyped
    * parameter markers, so the row's values bind directly in the
    * ON / UPDATE SET / INSERT VALUES positions, each cast to the
    * column's SQL type from `sqlType` (required for every column) —
    * which re-binds key columns twice and update columns twice; the
    * bind plan comes from [[bindColumns]].
    */
  final case class AnsiMerge(dummyTable: String = "SYSIBM.SYSDUMMY1") extends Dialect {
    def sql(table: String, cols: Seq[String], keys: Seq[String],
            sqlType: Map[String, String]): String = {
      val upd = nonKeys(cols, keys)
      val missing = cols.filterNot(sqlType.contains)
      require(missing.isEmpty, s"AnsiMerge needs a SQL type for every column; missing: $missing")
      def p(c: String) = s"CAST(? AS ${sqlType(c)})"
      val on = keys.map(k => s"t.$k = ${p(k)}").mkString(" AND ")
      val matched =
        if (upd.isEmpty) ""
        else "WHEN MATCHED THEN UPDATE SET " +
          upd.map(c => s"$c = ${p(c)}").mkString(", ") + " "
      s"MERGE INTO $table t USING $dummyTable ON $on " + matched +
        s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(p).mkString(", ")})"
    }

    override def bindColumns(cols: Seq[String], keys: Seq[String]): Seq[String] =
      keys ++ nonKeys(cols, keys) ++ cols
  }

  /** Execute the dialect's upsert for every row of `df`, one
    * connection per partition, `batchSize` rows per executeBatch +
    * commit. Idempotent per key by construction (replaying a batch
    * re-applies the same SET), so at-least-once task retries converge
    * — the same contract as the reference's chunk loop.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             dialect: Dialect, batchSize: Int = 5000,
             sqlType: Map[String, String] = Map.empty,
             connProps: Map[String, String] = Map.empty): Unit = {
    val cols = df.columns.toSeq
    val stmt = dialect.sql(table, cols, keys, sqlType) // fail fast, on the driver
    val bindIdx = dialect.bindColumns(cols, keys).map(cols.indexOf).toArray
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val props = new java.util.Properties()
        connProps.foreach { case (k, v) => props.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(stmt)
          try {
            var n = 0
            rows.foreach { r =>
              var i = 0
              while (i < bindIdx.length) { ps.setObject(i + 1, r.get(bindIdx(i))); i += 1 }
              ps.addBatch()
              n += 1
              if (n % batchSize == 0) { ps.executeBatch(); conn.commit() }
            }
            if (n % batchSize != 0) ps.executeBatch()
            // unconditional: statement close/metadata work counts as
            // transaction activity on some engines (Derby), and a
            // dangling open transaction fails the connection close
            conn.commit()
          } catch {
            case e: Throwable =>
              // roll back the open transaction before close, swallowing
              // any rollback error: closing with a live transaction
              // throws on Derby, and a throw from the cleanup path
              // would REPLACE the real batch failure
              try conn.rollback()
              catch { case scala.util.control.NonFatal(_) => () }
              throw e
          } finally ps.close()
        } finally conn.close()
      }
    }
  }
}
