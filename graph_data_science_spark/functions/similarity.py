"""Vector similarity functions over array columns
(gds.alpha.similarity.{cosine,euclidean,euclideanDistance,jaccard,overlap,
pearson}, ref: alpha/alpha-algo/.../similarity/CosineAlgorithm.java:25 etc.)

All pure JVM column expressions (zip_with + aggregate): usable inside any
DataFrame plan, no UDF round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sumsq(a) -> Column:
    return F.aggregate(
        _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v
    )


def cosine(a, b) -> Column:
    return _dot(a, b) / (F.sqrt(_sumsq(a)) * F.sqrt(_sumsq(b)))


def euclidean_distance(a, b) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                _c(a), _c(b), lambda x, y: (x.cast("double") - y) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def euclidean(a, b) -> Column:
    """Similarity form: 1 / (1 + distance) (reference convention)."""
    return 1.0 / (1.0 + euclidean_distance(a, b))


def pearson(a, b) -> Column:
    n = F.size(_c(a)).cast("double")
    ma = F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double")) / n
    mb = F.aggregate(_c(b), F.lit(0.0), lambda acc, v: acc + v.cast("double")) / n
    cov = F.aggregate(
        F.zip_with(
            _c(a), _c(b), lambda x, y: (x.cast("double") - ma) * (y.cast("double") - mb)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    va = F.aggregate(
        _c(a), F.lit(0.0), lambda acc, v: acc + (v.cast("double") - ma) ** 2
    )
    vb = F.aggregate(
        _c(b), F.lit(0.0), lambda acc, v: acc + (v.cast("double") - mb) ** 2
    )
    return cov / (F.sqrt(va) * F.sqrt(vb))


def jaccard(a, b) -> Column:
    """Set jaccard over array columns (categorical ids)."""
    inter = F.size(F.array_intersect(_c(a), _c(b))).cast("double")
    union = F.size(F.array_union(_c(a), _c(b))).cast("double")
    return inter / union


def overlap(a, b) -> Column:
    inter = F.size(F.array_intersect(_c(a), _c(b))).cast("double")
    return inter / F.least(F.size(_c(a)), F.size(_c(b))).cast("double")
