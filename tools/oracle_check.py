#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables and
compares against the parquet written by graft.Verify. Dev tool only (the
driver has its own); NOT part of the Spark library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return v
    return v


def compare(name, spark_rows, oracle_rows, cols):
    if len(spark_rows) != len(oracle_rows):
        return f"ROWCOUNT spark={len(spark_rows)} oracle={len(oracle_rows)}"
    exact = True
    close = True
    worst = None
    for a, b in zip(spark_rows, oracle_rows):
        for c, (x, y) in zip(cols, zip(a, b)):
            if x == y:
                continue
            if x is None or y is None:
                return f"NULL-MISMATCH col={c} spark={x} oracle={y}"
            if isinstance(x, float) and isinstance(y, float):
                exact = False
                if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                    d = abs(x - y)
                    if worst is None or d > worst[0]:
                        worst = (d, c, x, y)
                    continue
                return f"VALUE col={c} spark={x!r} oracle={y!r}"
            return f"VALUE col={c} spark={x!r} oracle={y!r}"
    if exact:
        return None
    return f"FLOAT-CLOSE-NOT-EXACT worst={worst}"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_sql = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output written")
            failures += 1
            continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            sq = con.execute(
                f"SELECT * FROM '{spark_path}/*.parquet'")
            scols = [d[0] for d in sq.description]
            srows = sq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
            failures += 1
            continue
        # sort columns by name (driver behavior), then rows for stability
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        key = lambda r: tuple((v is None, str(v)) for v in r)
        srows2 = sorted([tuple(r[i] for i in sidx) for r in srows], key=key)
        orows2 = sorted([tuple(r[i] for i in oidx) for r in orows], key=key)
        err = compare(name, srows2, orows2, sorted(scols))
        if err and not err.startswith("FLOAT-CLOSE"):
            print(f"FAIL {name}: {err}")
            failures += 1
        elif err:
            print(f"WARN {name}: {err} ({len(srows2)} rows)")
        else:
            print(f"OK   {name} ({len(srows2)} rows)")
    # queries with no oracle: rows-only note
    for p in sorted(Path(out_dir).iterdir()):
        if p.is_dir() and p.name not in oracle_sql:
            n = con.execute(f"SELECT COUNT(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"INFO {p.name}: rows-only, {n} rows")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
