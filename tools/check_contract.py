"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB
over the same parquet tables, then compares row count, column names, and
order-insensitive values (sorted rows, columns sorted by name).

Usage: python tools/check_contract.py [sf_dir] [query ...]
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

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

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
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = [tuple(norm(v) for v in row) for row in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
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
