"""Interactive SQL client over the engine — the Spark analog of the
reference's SQL-client workflow (experiment_with_flink_pulsar_sql_client.md:14-33:
start a client, register tables, run ad-hoc SQL against live data).

Starts one long-lived SparkSession, registers every testdata table as
a temp view (the DDL analog of the reference's CREATE TABLE ... WITH
(connector=...)), and reads SQL statements from stdin. Statements end
with `;`. Meta commands:

  \\d            list registered tables
  \\d <table>    describe a table's schema
  \\explain ...  show the optimized + physical plan for a query
  \\load <dir>   re-register views from another sf directory
  \\q            quit

Usage:  python tools/sql_shell.py [sf_dir]        # default sf0.01
        echo "SELECT COUNT(1) FROM lineitem;" | python tools/sql_shell.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from experiment_flink_cdc_connectors_postgres_datastream_spark.io import TABLES, register_views
from experiment_flink_cdc_connectors_postgres_datastream_spark.session import get_session

PROMPT = "spark-sql> "
MAX_ROWS = 100


def run_statement(spark, sql: str) -> None:
    t0 = time.time()
    df = spark.sql(sql)
    rows = df.limit(MAX_ROWS + 1).collect()
    shown = rows[:MAX_ROWS]
    if shown:
        widths = [
            max(len(c), *(len(str(r[i])) for r in shown))
            for i, c in enumerate(df.columns)
        ]
        header = " | ".join(c.ljust(w) for c, w in zip(df.columns, widths))
        print(header)
        print("-+-".join("-" * w for w in widths))
        for r in shown:
            print(" | ".join(str(v).ljust(w) for v, w in zip(r, widths)))
    note = f" (first {MAX_ROWS} shown)" if len(rows) > MAX_ROWS else ""
    print(f"{len(shown)} row(s){note} in {time.time() - t0:.2f}s")


def meta(spark, line: str, sf_dir: str) -> str:
    cmd, _, arg = line.partition(" ")
    arg = arg.strip()
    if cmd == "\\q":
        return "quit"
    if cmd == "\\d" and not arg:
        for t in spark.catalog.listTables():
            print(t.name)
    elif cmd == "\\d":
        spark.table(arg).printSchema()
    elif cmd == "\\explain":
        spark.sql(arg).explain("formatted")
    elif cmd == "\\load":
        register_views(spark, arg)
        print(f"registered {len(TABLES)} views from {arg}")
    else:
        print(f"unknown meta command: {cmd}")
    return ""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("sql_shell")
    register_views(spark, sf_dir)
    try:  # connector DDL: CREATE TABLE ... USING postgres_cdc OPTIONS (...)
        from experiment_flink_cdc_connectors_postgres_datastream_spark.sources.postgres_cdc import register as register_cdc_source

        register_cdc_source(spark)
        cdc_note = "   CREATE TABLE ... USING postgres_cdc"
    except ImportError:
        cdc_note = ""
    interactive = sys.stdin.isatty()
    if interactive:
        print(f"tables from {sf_dir}: {' '.join(TABLES)}")
        print(f"end statements with ';'   \\d tables   \\explain <sql>   \\q quit{cdc_note}")
    buf: list[str] = []
    while True:
        if interactive:
            sys.stdout.write(PROMPT if not buf else "        -> ")
            sys.stdout.flush()
        line = sys.stdin.readline()
        if not line:
            break
        line = line.rstrip("\n")
        if not buf and line.strip().startswith("\\"):
            if meta(spark, line.strip(), sf_dir) == "quit":
                break
            continue
        buf.append(line)
        if line.rstrip().endswith(";"):
            sql = "\n".join(buf).rstrip().rstrip(";")
            buf = []
            if not sql.strip():
                continue
            try:
                run_statement(spark, sql)
            except Exception as e:  # keep the shell alive on bad SQL
                print(f"ERROR: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
