#!/usr/bin/env python3
"""Execute JdbcUpsert's rendered PostgreSQL dialect against DuckDB.

Usage: python3 tools/dialect_exec.py [/tmp/upsert_sql.json]
  (run `sbt "runMain graft.schema.DumpUpsertSql /tmp/upsert_sql.json"`
  first so the statement under test is the REAL generator output)

DuckDB parses PostgreSQL's `INSERT … ON CONFLICT (k) DO UPDATE SET
c = EXCLUDED.c` and `RETURNING` natively, so this is a genuine
execution of the reference sink's statement shape
(reference ETL/user_ETL.py:104-118): insert → conflicting re-insert
updates in place → RETURNING surfaces the post-upsert row. The MySQL
`ON DUPLICATE KEY` string has no in-sandbox engine (offline cache
ships only Derby) and stays golden-pinned in JdbcUpsertSpec.
"""
import json
import sys

import duckdb


def main(path: str) -> int:
    sql = json.load(open(path))
    stmt = sql["postgres"]
    bind = sql["postgres_bind"].split(",")
    assert bind == ["user_id", "name", "city"], bind
    assert stmt.count("?") == len(bind), (stmt, bind)

    con = duckdb.connect()
    con.execute("CREATE TABLE users ("
                "user_id INTEGER PRIMARY KEY, name TEXT, city TEXT)")

    # 1. fresh inserts take the INSERT arm
    con.execute(stmt, [1, "ada", "lovelace"])
    con.execute(stmt, [2, "alan", "bletchley"])
    rows = con.execute("SELECT * FROM users ORDER BY user_id").fetchall()
    assert rows == [(1, "ada", "lovelace"), (2, "alan", "bletchley")], rows

    # 2. conflicting key takes the DO UPDATE arm (no duplicate row,
    #    non-key columns overwritten from EXCLUDED)
    con.execute(stmt, [1, "ada2", "london"])
    rows = con.execute("SELECT * FROM users ORDER BY user_id").fetchall()
    assert rows == [(1, "ada2", "london"), (2, "alan", "bletchley")], rows

    # 3. RETURNING surfaces the post-upsert row — the reference's
    #    `RETURNING id, bizkey` key-return contract, on both arms
    got = con.execute(stmt + " RETURNING user_id, name",
                      [3, "grace", "hopper"]).fetchall()
    assert got == [(3, "grace")], got
    got = con.execute(stmt + " RETURNING user_id, name",
                      [2, "alan2", "manchester"]).fetchall()
    assert got == [(2, "alan2")], got
    rows = con.execute("SELECT count(*) FROM users").fetchone()
    assert rows == (3,), rows

    # 4. idempotence: replaying the same upsert converges (the
    #    at-least-once retry contract of JdbcUpsert.upsert)
    con.execute(stmt, [2, "alan2", "manchester"])
    con.execute(stmt, [2, "alan2", "manchester"])
    rows = con.execute("SELECT * FROM users WHERE user_id = 2").fetchall()
    assert rows == [(2, "alan2", "manchester")], rows

    print("OK  postgres ON CONFLICT dialect: insert, conflict-update, "
          "RETURNING (both arms), idempotent replay — all asserted in DuckDB "
          f"{duckdb.__version__}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/upsert_sql.json"))
