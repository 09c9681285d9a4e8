#!/usr/bin/env python3
"""Column-name parity probe for the sbt-side OracleSchemaSpec.

Usage: python3 tools/oracle_schema.py <sfDir> <oracleSqlJson> <sparkSchemaJson>

For every oracle, DESCRIBEs the query in DuckDB (plans only, no
execution) and compares its output column-name SET against the Spark
side's schema (captured by the spec from each DataFrame, no execution
either). The driver's hash gate sorts columns BY NAME before comparing
values, so a renamed/aliased column on one side is a guaranteed
driver-time hash mismatch — this probe fails `sbt test` the moment the
two sides drift, years before the driver notices.

Exits 1 listing offenders; prints one `OK <name>` line per query.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, sql_json, schema_json = sys.argv[1], sys.argv[2], sys.argv[3]
    oracle_sql = json.loads(Path(sql_json).read_text())
    spark_schema = json.loads(Path(schema_json).read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name in sorted(oracle_sql):
        if name not in spark_schema:
            bad.append(f"{name}: no Spark schema captured")
            continue
        try:
            cols = [r[0] for r in
                    con.execute(f"DESCRIBE {oracle_sql[name]}").fetchall()]
        except Exception as e:  # noqa: BLE001 - report any planning error
            bad.append(f"{name}: DESCRIBE failed: {e}")
            continue
        want = spark_schema[name]
        if sorted(cols) != sorted(want):
            extra = sorted(set(cols) - set(want))
            missing = sorted(set(want) - set(cols))
            bad.append(f"{name}: oracle-only={extra} spark-only={missing}")
        elif len(cols) != len(set(cols)):
            bad.append(f"{name}: duplicate oracle column names {cols}")
        else:
            print(f"OK {name}")
    if bad:
        print("SCHEMA-DRIFT\n" + "\n".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
