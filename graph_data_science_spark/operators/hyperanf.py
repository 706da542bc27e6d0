"""HyperANF: approximate neighborhood function + effective diameter.

Boldi, Rosa & Vigna 2011 ("HyperANF: approximating the neighbourhood
function of very large graphs on a budget"): give every vertex a
HyperLogLog counter seeded with itself; each round replaces it with the
elementwise-max merge of its neighbors' counters — after t rounds the
counter estimates |B(v, t)|, the ball of radius t, and
N(t) = Σ_v |B(v, t)| is the neighborhood function whose saturation
point gives the (effective) diameter. The reference has no equivalent
(its closeness/diameter paths are exact MSBFS — fine to ~10^5 sources);
this is THE published technique for diameter estimates at web scale.

Spark-first shape: the m HLL registers are m INT COLUMNS, not an array
— the per-round merge is then ``groupBy(id).agg(max(r0)..max(r_{m-1}))``,
a pure codegen aggregation with map-side partial combine (hubs never
concentrate un-combined rows), and register state never leaves the JVM.
One shuffle per round; rounds = graph diameter. Register count m=64
(rsd ≈ 13%) keeps the row width trivial next to a 100-TB edge table.

Estimates use the standard HLL-with-linear-counting estimator, computed
as a generated column expression (no UDF, no driver loops beyond one
collect of the per-round scalar).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.checkpoint import loop_checkpoint

M_REGS = 64
_ALPHA_64 = 0.709  # alpha_m for m = 64


def _reg_cols():
    return [f"r{i}" for i in range(M_REGS)]


def _init_registers(vertices: DataFrame) -> DataFrame:
    """Seed each vertex's HLL with exactly itself: register index =
    low 6 bits of a 64-bit hash, value = rho(remaining bits)."""
    h = F.xxhash64(F.col("internal_id"))
    idx = F.pmod(h, F.lit(M_REGS))
    # rho: leading-zero count of the hash's top bits + 1; use the bit
    # position of the highest set bit of the remaining 58 bits
    rest = F.shiftrightunsigned(h, 6)
    # 58-bit w: leading zeros = 57 - floor(log2 w), rho = lz + 1; rho(0) = 59
    rho = F.when(rest == 0, F.lit(59)).otherwise(
        F.lit(58) - F.floor(F.log2(rest.cast("double")))
    ).cast("int")
    cols = [F.col("internal_id").alias("id")]
    for i in range(M_REGS):
        cols.append(
            F.when(idx == i, rho).otherwise(F.lit(0)).cast("int").alias(f"r{i}")
        )
    return vertices.select(*cols)


def _estimate_col():
    """HLL estimate over the m register columns, with the linear-counting
    small-range correction — a pure column expression."""
    inv_sum = None
    zeros = None
    for c in _reg_cols():
        term = F.pow(F.lit(2.0), -F.col(c).cast("double"))
        z = F.when(F.col(c) == 0, 1).otherwise(0)
        inv_sum = term if inv_sum is None else inv_sum + term
        zeros = z if zeros is None else zeros + z
    raw = F.lit(_ALPHA_64 * M_REGS * M_REGS) / inv_sum
    linear = F.lit(float(M_REGS)) * F.log(
        F.lit(float(M_REGS)) / zeros.cast("double")
    )
    return F.when(
        (raw <= 2.5 * M_REGS) & (zeros > 0), linear
    ).otherwise(raw)


def neighborhood_function(
    graph: Graph, *, max_t: int = 64, metrics_out: dict | None = None
) -> list[tuple[int, float]]:
    """[(t, N_t)]: estimated number of (ordered) vertex pairs within
    distance <= t over the UNDIRECTED graph, for t = 0 .. convergence
    (registers stable) or ``max_t``. N_0 = |V| estimate; the saturation
    value estimates |pairs in the same component|."""
    e = graph.edges.select("src", "dst")
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    regs = _init_registers(graph.vertices).localCheckpoint(eager=True)
    out = [(0, float(regs.select(F.sum(_estimate_col())).collect()[0][0]))]
    maxes = [F.max(c).alias(c) for c in _reg_cols()]
    for t in range(1, max_t + 1):
        nbr = edges.join(
            regs.select(F.col("id").alias("src"), *_reg_cols()), "src"
        ).select(F.col("dst").alias("id"), *_reg_cols())
        new = nbr.union(regs).groupBy("id").agg(*maxes)
        new = loop_checkpoint(new, t)
        changed = (
            new.alias("n")
            .join(regs.alias("o"), "id")
            .filter(
                " or ".join(f"n.r{i} != o.r{i}" for i in range(M_REGS))
            )
            .count()
        )
        regs = new
        out.append(
            (t, float(regs.select(F.sum(_estimate_col())).collect()[0][0]))
        )
        if changed == 0:
            break
    if metrics_out is not None:
        metrics_out["rounds"] = out[-1][0]
    return out


def effective_diameter(
    graph: Graph, *, q: float = 0.9, max_t: int = 64
) -> dict:
    """{effective_diameter, neighborhood_function, reachable_pairs}:
    the smallest t with N(t) >= q * N(converged), with linear
    interpolation between the bracketing rounds (the standard
    HyperANF/Palmer definition)."""
    nf = neighborhood_function(graph, max_t=max_t)
    n_inf = nf[-1][1]
    target = q * n_inf
    eff = float(nf[-1][0])
    for (t0, a), (t1, b) in zip(nf, nf[1:]):
        if a < target <= b:
            eff = t0 + (target - a) / (b - a) if b > a else float(t1)
            break
    else:
        if nf[0][1] >= target:
            eff = 0.0
    return {
        "effective_diameter": eff,
        "neighborhood_function": nf,
        "reachable_pairs": n_inf,
    }
