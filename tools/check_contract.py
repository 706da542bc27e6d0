"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB
over the same parquet tables, then compares row count, column names, and
order-insensitive values (sorted rows, columns sorted by name).

Usage: python tools/check_contract.py [sf_dir] [query ...]

``GDS_ORACLE_TIMEOUT`` (seconds) interrupts a DuckDB oracle that runs
past the budget and records the row as ``ok? (oracle timeout)`` with
the Spark result still required to be non-empty. The brute-force
oracles (per-source BFS closures, per-edge-removal reachability) are
O(V·E) recursive CTEs by design — exact and cheap at sf0.01 (the
driver's gate), intractable at sf0.1; the timeout lets a big-sf sweep
still exercise every SPARK plan at 10x data, which is what a large-sf
pass is for (size-gated strategy bugs), without waiting hours on
oracle SQL. ``GDS_ORACLE_MEM`` (default 24GB) bounds DuckDB memory so
a heavy oracle errors instead of swapping the box.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if sf_dir.startswith("-") or not os.path.isdir(sf_dir):
        sys.exit(
            "usage: python tools/check_contract.py [sf_dir] [query ...]\n"
            f"not a data directory: {sf_dir!r}"
        )
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from graph_data_science_spark.session import get_spark

    cpus = int(os.environ.get("GDS_CHECK_CPUS", 8))
    spark = get_spark(
        "contract-check", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    oracle_timeout = float(os.environ.get("GDS_ORACLE_TIMEOUT", 0) or 0)

    def make_con():
        c = duckdb.connect()
        c.execute(
            f"SET memory_limit = "
            f"'{os.environ.get('GDS_ORACLE_MEM', '24GB')}'"
        )
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                c.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        return c

    con = make_con()

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [
                tuple(norm(v) for v in row)
                for row in (
                    r[1:] if False else r
                    for r in (tuple(x) for x in sdf.collect())
                )
            ]
            spark_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(spark_rows)} rows "
                  f"({t_spark:.1f}s)")
            if len(spark_rows) == 0:
                failures.append(name)
            continue
        t0 = time.monotonic()
        timer = None
        fired = None
        if oracle_timeout:
            import threading

            # `fired` guards the success-path race: if the Timer pops
            # after the query completes but before cancel(), the
            # interrupt flag would land on an idle connection and
            # spuriously abort the NEXT query — when it fired at all,
            # rebuild the connection before moving on.
            fired = threading.Event()

            def _interrupt():
                fired.set()
                con.interrupt()

            timer = threading.Timer(oracle_timeout, _interrupt)
            timer.start()
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = [tuple(norm(v) for v in row) for row in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            if timer is not None:
                timer.cancel()
            if fired is not None and fired.is_set():
                con = make_con()
            msg = f"{type(e).__name__}: {e}"
            # budget overruns are ONLY a fired timeout or DuckDB's
            # specific out-of-memory type — a generic error merely
            # mentioning 'memory' is a genuine oracle bug and must FAIL
            oom = isinstance(
                e, getattr(duckdb, "OutOfMemoryException", ())
            )
            budget_hit = (
                oracle_timeout
                and (
                    "INTERRUPT" in msg.upper()
                    or (fired is not None and fired.is_set())
                )
            ) or oom
            if budget_hit:
                status = "ok?" if spark_rows else "FAIL"
                print(
                    f"{status} {name}: oracle over budget "
                    f"({time.monotonic() - t0:.0f}s/{oracle_timeout}s) — "
                    f"spark ran, {len(spark_rows)} rows "
                    f"({t_spark:.1f}s); exact compare needs a smaller sf "
                    f"[{msg}]"
                )
                if not spark_rows:
                    failures.append(name)
                continue
            failures.append(name)
            print(f"FAIL {name}: duckdb error {msg}")
            continue
        if timer is not None:
            timer.cancel()
            if fired is not None and fired.is_set():
                # fired after completion: the stale interrupt flag would
                # poison the next query — reconnect
                con = make_con()
        t_duck = time.monotonic() - t0

        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            ok = False
        if len(spark_rows) != len(duck_rows):
            print(
                f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
            )
            ok = False
        if ok:
            # column-name-sorted projection, order-insensitive compare
            sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
            didx = [duck_cols.index(c) for c in sorted(duck_cols)]
            s_sorted = sorted(tuple(r[i] for i in sidx) for r in spark_rows)
            d_sorted = sorted(tuple(r[i] for i in didx) for r in duck_rows)
            if s_sorted != d_sorted:
                diffs = [
                    (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
                ][:5]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(
                f"PASS {name}: {len(spark_rows)} rows "
                f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
            )
        else:
            failures.append(name)

    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
