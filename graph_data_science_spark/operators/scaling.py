"""Scalar scalers applied to score columns.

Variants and exact formulas mirror the reference
(ref: algo-common/src/main/java/org/neo4j/gds/scaling/ScalarScaler.java:55-116):
NONE, MAX (x/max|x|), MINMAX ((x-min)/(max-min)), MEAN ((x-mean)/(max-min)),
LOG (ln x), STDSCORE ((x-mean)/std), L1NORM (x/sum|x|), L2NORM (x/sqrt(sum x^2)).
Degenerate denominators (0) yield 0, matching the reference's CLOSE_TO_ZERO
guards. One aggregate job + one column expression — fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALERS = ("NONE", "MAX", "MINMAX", "MEAN", "LOG", "STDSCORE", "L1NORM", "L2NORM")


def scale_column(df: DataFrame, col: str, variant: str) -> DataFrame:
    variant = variant.upper()
    if variant not in SCALERS:
        raise ValueError(f"unknown scaler {variant!r}; expected one of {SCALERS}")
    if variant == "NONE":
        return df
    if variant == "LOG":
        return df.withColumn(col, F.log(F.col(col)))

    x = F.col(col)
    stats = df.agg(
        F.max(F.abs(x)).alias("absmax"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
        F.avg(x).alias("avg"),
        F.stddev_pop(x).alias("std"),
        F.sum(F.abs(x)).alias("l1"),
        F.sqrt(F.sum(x * x)).alias("l2"),
    ).collect()[0]

    def safe(num, den):
        return F.when(F.lit(den) == 0, F.lit(0.0)).otherwise(num / F.lit(den))

    if variant == "MAX":
        out = safe(x, stats["absmax"])
    elif variant == "MINMAX":
        out = safe(x - F.lit(stats["mn"]), stats["mx"] - stats["mn"])
    elif variant == "MEAN":
        out = safe(x - F.lit(stats["avg"]), stats["mx"] - stats["mn"])
    elif variant == "STDSCORE":
        out = safe(x - F.lit(stats["avg"]), stats["std"])
    elif variant == "L1NORM":
        out = safe(x, stats["l1"])
    else:  # L2NORM
        out = safe(x, stats["l2"])
    return df.withColumn(col, out)
