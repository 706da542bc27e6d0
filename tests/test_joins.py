"""As-of join vs pandas merge_asof; range join vs brute force."""

import numpy as np
import pandas as pd

from graph_data_science_spark.pipeline.joins import asof_join, range_join


def test_asof_join_matches_pandas(spark):
    rng = np.random.default_rng(9)
    lrows = [
        (int(k), float(t), int(v))
        for k, t, v in zip(
            rng.integers(0, 5, 200), rng.integers(0, 1000, 200), range(200)
        )
    ]
    # unique right timestamps per key (the as-of contract)
    seen = set()
    rrows = []
    for k, t, s in zip(
        rng.integers(0, 5, 80), rng.integers(0, 1000, 80), range(80)
    ):
        if (int(k), float(t)) not in seen:
            seen.add((int(k), float(t)))
            rrows.append((int(k), float(t), f"s{s}"))
    left = spark.createDataFrame(lrows, "k long, ts double, v long")
    right = spark.createDataFrame(rrows, "k long, ts double, status string")
    got = {
        (r.k, r.ts, r.v): (r.ts_right, r.status_right)
        for r in asof_join(left, right, on="k").collect()
    }
    lp = pd.DataFrame(lrows, columns=["k", "ts", "v"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "status"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward",
                        suffixes=("", "_right"))
    assert len(got) == len(lrows)
    for _, row in exp.iterrows():
        # suffixes only apply on collisions: right "status" keeps its name
        g = got[(row.k, row.ts, row.v)]
        if pd.isna(row.status):
            assert g == (None, None)
        else:
            assert g[1] == row.status


def test_asof_join_tolerance_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 10.0, 1), (1, 100.0, 2)], "k long, ts double, v long"
    )
    right = spark.createDataFrame(
        [(1, 10.0, "exact"), (1, 50.0, "old")], "k long, ts double, s string"
    )
    out = {r.v: (r.ts_right, r.s_right)
           for r in asof_join(left, right, on="k").collect()}
    assert out[1] == (10.0, "exact")   # inclusive tie
    assert out[2] == (50.0, "old")
    tol = {r.v: r.s_right
           for r in asof_join(left, right, on="k", tolerance=20).collect()}
    assert tol[1] == "exact" and tol[2] is None  # 100-50 > 20


def test_range_join_matches_bruteforce(spark):
    rng = np.random.default_rng(4)
    points = [
        (int(k), float(t), i)
        for i, (k, t) in enumerate(
            zip(rng.integers(0, 4, 150), rng.integers(0, 500, 150))
        )
    ]
    ivals = []
    for i, (k, s) in enumerate(
        zip(rng.integers(0, 4, 40), rng.integers(0, 480, 40))
    ):
        ivals.append((int(k), float(s), float(s + rng.integers(1, 60)), i))
    p = spark.createDataFrame(points, "k long, ts double, pid long")
    iv = spark.createDataFrame(ivals, "k long, start double, end double, iid long")
    for bw in (7.0, 64.0, 500.0):
        got = {
            (r.pid, r.iid)
            for r in range_join(p, iv, on="k", bin_width=bw).collect()
        }
        exp = {
            (pid, iid)
            for k, t, pid in points
            for k2, s, e, iid in ivals
            if k == k2 and s <= t < e
        }
        assert got == exp, bw
    # left join keeps unmatched points with null interval
    lj = range_join(p, iv, on="k", bin_width=16.0, how="left")
    assert lj.count() >= len(points)
    unmatched = {r.pid for r in lj.filter("iid is null").collect()}
    matched_pids = {pid for pid, _ in exp}
    assert unmatched == {pid for _, _, pid in points} - matched_pids
