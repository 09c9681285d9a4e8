#!/usr/bin/env python3
"""Oracle tractability probe for the sbt-side OracleSpec.

Usage: python3 tools/oracle_time.py <sfDir> <oracleSqlJson> [budget_sec]

Runs every oracle in the JSON map against the sfDir parquet tables under a
per-query wall-clock budget (duckdb interrupt), printing one line per
query: `<seconds> <name>`. Exits 1 listing offenders if any query exceeds
the budget or errors. This is the CI-shape guard for the round-12 outage:
an oracle that DuckDB 1.0's CTE inlining makes combinatorial must fail
`sbt test`, not stall the driver's gate.
"""
import json
import sys
import threading
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, sql_json = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    oracle_sql = json.loads(Path(sql_json).read_text())
    bad = []

    def connect():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    con = connect()
    for name in sorted(oracle_sql):
        timed_out = threading.Event()

        def fire(c=con):
            timed_out.set()
            c.interrupt()

        # interrupt() only lands during EXECUTION; a combinatorial CTE
        # inlining blowup hangs in BINDING/PLANNING where duckdb ignores
        # it — so a second watchdog hard-exits the process, loudly naming
        # the offender (the round-12 failure mode must never hang CI)
        def hard_fail(n=name):
            print(f"OVER-BUDGET {n}: hard-hung past {budget}s "
                  f"(interrupt ignored — planning blowup?)", flush=True)
            import os
            os._exit(1)

        t = threading.Timer(budget, fire)
        t.start()
        t2 = threading.Timer(budget + 15.0, hard_fail)
        t2.daemon = True
        t2.start()
        t0 = time.monotonic()
        try:
            con.execute(oracle_sql[name]).fetchall()
            print(f"{time.monotonic() - t0:.2f} {name}")
        except Exception as e:
            if timed_out.is_set():
                bad.append(f"{name}: exceeded {budget}s budget")
            else:
                bad.append(f"{name}: {e}")
            con = connect()  # a fatal error invalidates the connection
        finally:
            t.cancel()
            t2.cancel()
    for b in bad:
        print(f"OVER-BUDGET {b}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
