"""Derive a deterministic mid-size fixture between sf0.01 and sf0.1.

The MSBFS-family oracles (betweenness / closeness / harmonic) are
brute-force per-source recursive CTEs — exact and cheap at sf0.01 (the
driver's gate), intractable at sf0.1. This tool filters sf0.1 down to
the first ``--suppliers`` supplier keys (lineitem + supplier rows;
every other table is symlinked unchanged), giving a ~3x-the-gate graph
where the MATERIALIZED-CTE oracles still fit a sane budget, so the
three operators keep an exact correctness row above sf0.01
(round-3 verdict Next-round item 8).

Usage: python tools/make_midsf.py [out_dir] [--src /root/testdata/sf0.1]
       [--suppliers 300]
Then:  python tools/check_contract.py <out_dir> betweenness closeness harmonic
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build(out_dir: str, src_dir: str, n_suppliers: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t, pred in (
        ("lineitem", f"l_suppkey <= {n_suppliers}"),
        ("supplier", f"s_suppkey <= {n_suppliers}"),
    ):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src_dir}/{t}.parquet') "
            f"WHERE {pred}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        os.symlink(f"{src_dir}/{t}.parquet", dst)
    n_li = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/lineitem.parquet')"
    ).fetchone()[0]
    print(f"midsf at {out_dir}: {n_suppliers} suppliers, {n_li} lineitems")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/gds_sfmid")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--suppliers", type=int, default=300)
    a = ap.parse_args()
    build(a.out_dir, a.src, a.suppliers)
