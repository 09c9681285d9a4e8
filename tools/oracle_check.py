#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [budget_sec]

Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables and
compares against the parquet written by graft.Verify. Dev tool only (the
driver has its own); NOT part of the Spark library.

Every oracle runs under a wall-clock budget (default 30 s, override via
argv[3] or ORACLE_BUDGET_SEC) enforced with duckdb's interrupt() from a
timer thread, and each line prints the oracle's wall time. Round-12
lesson: DuckDB 1.0 inlines every CTE, one unrolled-chain oracle planned
combinatorially (>25 min at sf0.01), and a sequential gate with no budget
stalled on it and recorded an EMPTY round. An intractable oracle must be
a loud per-query FAIL, never a silent hang.

Compares at the ARROW level (typed), not via fetchall() Python coercion:
round 1 taught us that DuckDB's integer SUM returns HUGEINT (arrow
decimal128(38,0), pandas float64) where Spark returns BIGINT, and the
driver's hash compare distinguishes them even when values are equal.
A fetchall() compare coerces both to Python int and masks the mismatch.
"""
import json
import math
import os
import sys
import threading
import time
from pathlib import Path

import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Arrow type classes that must match exactly between engines or the driver's
# typed hash diverges even on equal values.
def type_class(t):
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_class(t.value_type)}>"
    return str(t)


def check_types(name, s_schema, o_schema, cols):
    """Hard-fail on cross-class mismatches (decimal vs int = the HUGEINT
    trap; float vs int; string vs anything). Warn on same-class width
    differences (int32 vs int64) which the driver's value hash tolerates."""
    errs, warns = [], []
    for c in cols:
        st = s_schema.field(c).type
        ot = o_schema.field(c).type
        if st == ot:
            continue
        sc, oc = type_class(st), type_class(ot)
        if sc != oc:
            hint = ""
            if oc.startswith("decimal(38,0)") or oc == "decimal(38,0)":
                hint = " (HINT: un-cast integer SUM in oracle SQL — wrap in CAST(... AS BIGINT))"
            errs.append(f"TYPE col={c} spark={st} oracle={ot}{hint}")
        else:
            warns.append(f"type-width col={c} spark={st} oracle={ot}")
    return errs, warns


def compare(name, spark_rows, oracle_rows, cols):
    if len(spark_rows) != len(oracle_rows):
        return f"ROWCOUNT spark={len(spark_rows)} oracle={len(oracle_rows)}"
    exact = True
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


def run_budgeted(con, sql, budget_sec, name):
    """Execute `sql`, interrupting (and raising TimeoutError) past the
    budget. The timer fires con.interrupt(); duckdb raises
    InterruptException inside execute(), which we map to TimeoutError so
    the caller prints a distinct BUDGET failure. interrupt() only lands
    during EXECUTION — a combinatorial CTE-inlining blowup hangs in
    BINDING/PLANNING where duckdb ignores it, so a second watchdog
    hard-exits the whole process, loudly naming the offender (a silent
    hang is exactly the round-12 empty-gate failure mode)."""
    timed_out = threading.Event()

    def fire():
        timed_out.set()
        con.interrupt()

    def hard_fail():
        print(f"FAIL {name}: hard-hung past {budget_sec}s "
              f"(interrupt ignored — planning blowup?)", flush=True)
        os._exit(1)

    t = threading.Timer(budget_sec, fire)
    t.start()
    t2 = threading.Timer(budget_sec + 15.0, hard_fail)
    t2.daemon = True
    t2.start()
    try:
        return con.execute(sql).fetch_arrow_table()
    except duckdb.Error:
        if timed_out.is_set():
            raise TimeoutError(f"oracle exceeded {budget_sec}s budget")
        raise
    finally:
        t.cancel()
        t2.cancel()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else \
        float(os.environ.get("ORACLE_BUDGET_SEC", "30"))
    # The gate's conventions are calibrated per engine version
    # (OracleConventionSpec pins them); record which engine produced
    # this run so a drifted result is attributable.
    print(f"oracle engine: duckdb {duckdb.__version__}")

    def connect():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    con = connect()
    oracle_sql = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    timings = {}
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output written")
            failures += 1
            continue
        t0 = time.monotonic()
        try:
            o_tbl = run_budgeted(con, sql, budget, name)
            timings[name] = time.monotonic() - t0
        except TimeoutError as e:
            print(f"FAIL {name}: BUDGET {e} "
                  f"(intractable oracle — check CTE materialization)")
            failures += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            # a duckdb INTERNAL error invalidates the whole connection —
            # reconnect so one bad oracle cannot cascade the rest of the
            # sweep (r13: a binder bug on one query zeroed 219 others)
            if "invalidated" in str(e) or "INTERNAL" in str(e):
                con = connect()
            continue
        try:
            s_tbl = con.execute(
                f"SELECT * FROM '{spark_path}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            failures += 1
            continue
        scols, ocols = s_tbl.column_names, o_tbl.column_names
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
            failures += 1
            continue
        cols = sorted(scols)
        terrs, twarns = check_types(name, s_tbl.schema, o_tbl.schema, cols)
        if terrs:
            for e in terrs:
                print(f"FAIL {name}: {e}")
            failures += 1
            continue
        # sort columns by name (driver behavior), then rows for stability
        def rows_of(tbl):
            pylists = {c: tbl.column(c).to_pylist() for c in cols}
            return [tuple(pylists[c][i] for c in cols) for i in range(tbl.num_rows)]
        key = lambda r: tuple((v is None, str(v)) for v in r)
        srows2 = sorted(rows_of(s_tbl), key=key)
        orows2 = sorted(rows_of(o_tbl), key=key)
        err = compare(name, srows2, orows2, cols)
        wnote = f" [{'; '.join(twarns)}]" if twarns else ""
        tnote = f" {timings[name]:.2f}s"
        if err and not err.startswith("FLOAT-CLOSE"):
            print(f"FAIL {name}: {err}")
            failures += 1
        elif err:
            print(f"WARN {name}: {err} ({len(srows2)} rows){wnote}{tnote}")
        else:
            print(f"OK   {name} ({len(srows2)} rows){wnote}{tnote}")
    # queries with no oracle: rows-only note
    for p in sorted(Path(out_dir).iterdir()):
        if p.is_dir() and p.name not in oracle_sql:
            n = con.execute(f"SELECT COUNT(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"INFO {p.name}: rows-only, {n} rows")
    if timings:
        slow = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
        total = sum(timings.values())
        print(f"oracle wall total {total:.1f}s; slowest: " +
              ", ".join(f"{n}={s:.2f}s" for n, s in slow))
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
