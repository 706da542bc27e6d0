"""Measure this host's concurrent memory-bound stream ceiling.

The scaling harness (tools/bench_scaling.py) picks its N→4N core pair so
BOTH sides stay under the host's DRAM-contention knee — on a real
cluster every executor brings its own memory channels, so a single-box
pair measured past the knee understates the engine, not the design.
This tool makes the knee an auditable number instead of a prose claim:
it runs K identical taskset-pinned worker processes, each doing the
fused kernel's hot numpy pattern (random int32 gather + segment
reduceat over a working set far larger than L3), and reports per-process
wall-time inflation vs K=1.

Usage: python tools/membw_ceiling.py [counts...]   (default 1 2 4 8 16)
Prints one JSON line: {"base_sec": s, "inflation": {K: x, ...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import numpy as np, time, sys
n_src = 4_000_000
n_edges = 24_000_000
rng = np.random.default_rng(7)
vals = rng.integers(0, n_src, n_src).astype(np.int32)
idx = rng.integers(0, n_src, n_edges).astype(np.int64)
starts = np.arange(0, n_edges, 32)
t0 = time.monotonic()
for _ in range(3):
    pe = vals[idx]                      # the scatter gather
    acc = np.minimum.reduceat(pe, starts)  # the segment reduce
print(time.monotonic() - t0)
"""


def run_k(k: int) -> float:
    procs = []
    for i in range(k):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, "-c", WORKER],
                stdout=subprocess.PIPE,
                text=True,
            )
        )
    times = [float(p.communicate()[0].strip()) for p in procs]
    return max(times)  # slowest worker = the completed-superstep time


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    base = run_k(1)
    out = {"base_sec": round(base, 2), "inflation": {}}
    for k in counts:
        if k == 1:
            out["inflation"]["1"] = 1.0
            continue
        out["inflation"][str(k)] = round(run_k(k) / base, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
