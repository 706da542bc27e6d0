"""Temporal join operators Spark lacks as built-ins: as-of join and
binned range join.

Both are expressed as compositions of existing DataFrame operators (the
preferred strategy for custom operators — Catalyst keeps optimizing
them), never per-key loops or UDFs:

- :func:`asof_join` — the union-sort formulation: tag both inputs,
  union, and take ``last(payload, ignorenulls)`` over a per-key window
  ordered by (ts, side). ONE shuffle keyed by the join keys; no
  per-left-row probe, no range join explosion. This is how kdb/pandas
  ``merge_asof`` semantics map onto a shuffle engine.
- :func:`range_join` — the binning formulation: intervals explode into
  the fixed-width bins they cover, points key into their bin, and the
  range predicate becomes an equi-join + residual filter. Turns the
  O(|L|·|R|) range predicate Spark would otherwise BNL-join into a
  shuffle join keyed on (key, bin); bin width trades replication
  against selectivity (set it near the median interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str] | str,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    tolerance: float | int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the LATEST right row of the same key
    with ``right.ts <= left.ts`` (inclusive; pandas ``merge_asof``
    backward semantics) — unmatched left rows keep nulls (left join).
    ``tolerance`` additionally requires ``left.ts - right.ts <=
    tolerance``. Right value columns come back suffixed; the matched
    right timestamp is ``<ts_col><suffix>``.

    Ordering is total — ties on (key, ts) between right rows resolve to
    the one latest in the window's deterministic (ts, side) order only
    if right timestamps are unique per key; dedupe the right side first
    when they are not (the usual as-of contract)."""
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts_col or ts_col
    val_cols = [c for c in right.columns if c not in set(keys) | {rts}]

    payload = F.struct(
        F.col(rts).cast("double").alias("__rts"),
        *[F.col(c) for c in val_cols],
    )
    r_shaped = right.select(
        *keys,
        F.col(rts).cast("double").alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    payload_t = r_shaped.schema["__p"].dataType
    l_shaped = left.select(
        "*",
        F.col(ts_col).cast("double").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_t).alias("__p"),
    )
    # align columns: right side carries nulls for the left payload
    l_cols = [c for c in left.columns]
    r_full = r_shaped.select(
        *[
            F.lit(None).cast(dict(zip(left.columns, left.schema))[c].dataType)
            .alias(c)
            if c not in keys
            else F.col(c)
            for c in l_cols
        ],
        "__ts",
        "__side",
        "__p",
    )
    u = l_shaped.select(*l_cols, "__ts", "__side", "__p").unionByName(r_full)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__ts") - F.col("__m.__rts") <= float(tolerance),
                F.col("__m"),
            ),
        )
    out_cols = [F.col(c) for c in l_cols]
    out_cols.append(F.col("__m.__rts").alias(f"{ts_col}{suffix}"))
    out_cols.extend(
        F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in val_cols
    )
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: list[str] | str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row of the same key with
    ``start <= ts < end`` — via binning: each interval replicates into
    the ``bin_width``-sized bins it covers, each point keys into its
    bin, and the range predicate becomes an equi-join on (key, bin)
    plus a residual filter. ``how`` is "inner" or "left" (unmatched
    points keep nulls).

    Replication factor per interval = its length / bin_width (+1), so
    pick ``bin_width`` near the typical interval length."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    keys = [on] if isinstance(on, str) else list(on)
    bw = float(bin_width)

    lo = F.floor(F.col(start_col).cast("double") / bw)
    # end exclusive: an end on a bin boundary adds no bin; empty/zero-
    # length intervals clamp to one bin (the residual filter drops them)
    hi = F.greatest(
        lo, F.floor((F.col(end_col).cast("double") - 1e-12) / bw)
    )
    i_bins = intervals.select("*", F.explode(F.sequence(lo, hi)).alias("__bin"))
    p_bins = points.withColumn(
        "__bin", F.floor(F.col(ts_col).cast("double") / bw)
    )
    cond = [p_bins[k] == i_bins[k] for k in keys] + [
        p_bins["__bin"] == i_bins["__bin"],
        p_bins[ts_col].cast("double") >= i_bins[start_col].cast("double"),
        p_bins[ts_col].cast("double") < i_bins[end_col].cast("double"),
    ]
    joined = p_bins.join(i_bins, cond, how)
    out = joined.select(
        *[p_bins[c] for c in points.columns],
        *[
            i_bins[c].alias(c if c not in points.columns else f"{c}_interval")
            for c in intervals.columns
            if c not in keys
        ],
    )
    return out
