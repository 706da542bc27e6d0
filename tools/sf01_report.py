"""Merge sharded sf0.1 contract-sweep logs into ROUND3_SF01.md.

Usage: python tools/sf01_report.py LOG [LOG ...]

Parses the ``PASS name: N rows (spark Xs, duckdb Ys)`` /
``ok? name: ...`` / ``FAIL name: ...`` lines emitted by
tools/check_contract.py and writes a per-query table plus totals.
"""

from __future__ import annotations

import os
import re
import sys

LINE = re.compile(
    r"^(PASS|ok\?|FAIL)\s+(\S+?):\s+(.*)$"
)
TIMES = re.compile(
    r"(\d+) rows \(spark ([\d.]+)s(?:, duckdb ([\d.]+)s)?\)"
)


def main() -> None:
    rows: dict[str, tuple[str, str]] = {}
    for path in sys.argv[1:]:
        with open(path, errors="replace") as f:
            for raw in f:
                # progress bars share lines with results; split on CR
                for line in raw.replace("\r", "\n").split("\n"):
                    m = LINE.match(line.strip())
                    if m:
                        status, name, detail = m.groups()
                        rows[name] = (status, detail.strip())

    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    order = list(entry.queries())

    n_pass = sum(1 for s, _ in rows.values() if s == "PASS")
    n_budget = sum(1 for s, _ in rows.values() if s == "ok?")
    n_fail = sum(1 for s, _ in rows.values() if s == "FAIL")
    missing = [q for q in order if q not in rows]

    out = [
        "# ROUND3_SF01 — full contract sweep at sf0.1",
        "",
        "Every registry query run on Spark against `/root/testdata/"
        "sf0.1` (10× the driver's sf0.01 gate), compared to its DuckDB "
        "oracle under a time/memory budget (`GDS_ORACLE_TIMEOUT`; the "
        "brute-force per-source/per-edge-removal oracles are O(V·E) "
        "recursive CTEs — exact at sf0.01, intractable at sf0.1, see "
        "ROUND3.md). `PASS` = exact oracle match at sf0.1; "
        "`oracle>budget` = Spark ran green (non-empty, no error), "
        "oracle comparison only feasible at smaller sf; queries were "
        "swept in 5 concurrent shards, so wall times overlap.",
        "",
        f"**Totals: {n_pass} exact PASS, {n_budget} spark-green with "
        f"oracle over budget, {n_fail} FAIL, {len(missing)} not run.**",
        "",
        "| query | result | detail |",
        "|---|---|---|",
    ]
    label = {"PASS": "PASS", "ok?": "oracle>budget", "FAIL": "FAIL"}
    for q in order:
        if q in rows:
            s, d = rows[q]
            lab = label[s]
            if s == "ok?" and "rows-only" in d:
                lab = "spark-green (rows-only)"
            out.append(f"| {q} | {lab} | {d} |")
    for q in missing:
        out.append(f"| {q} | not run | |")
    with open(os.path.join(repo, "ROUND3_SF01.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"pass={n_pass} budget={n_budget} fail={n_fail} "
          f"missing={len(missing)}")


if __name__ == "__main__":
    main()
