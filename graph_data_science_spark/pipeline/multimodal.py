"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark side (schemas, partition-aware batching, Arrow UDF signatures) is
real and tested; the codec step is STUBBED — this container ships no
image/audio libraries, so decode is a deterministic fake behind
``use_stub=True`` and raises ``NotImplementedError`` otherwise. Swap
``_decode_image_stub`` for a PIL/ffmpeg call on a real cluster; nothing
else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)
FEATURE_SCHEMA = "media_id long, feature array<float>, n_bytes int"


def synthesize_media(spark, n: int, *, kind: str = "image") -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes) for testing
    the plumbing at any scale."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        (F.pmod(F.col("id"), F.lit(64)) + 32).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(48)) + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.col("id"), F.lit(5000)) + 100).cast("int").alias("duration_ms"),
    )


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    # deterministic fake decode: bytes -> tiled pixel array
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    reps = need // len(raw) + 1
    return np.tile(raw, reps)[:need].astype(np.float32)


def extract_features(
    media: DataFrame, *, dim: int = 16, use_stub: bool = True
) -> DataFrame:
    """Per-item feature vector via ``mapInPandas`` (Arrow batches; numpy
    inside). Stub feature = dim-bucket mean-pool of the decoded pixels."""
    if not use_stub:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not in this container"
        )

    def fe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"],
                     "feature": pd.Series([], dtype=object),
                     "n_bytes": pd.Series([], dtype="int32")}
                )
                continue
            # decode is per-item (a real codec is too); pooling is one
            # C-level reduceat over the concatenated pixel stream
            chunks = [
                _decode_image_stub(row.payload, row.width, row.height)
                for row in pdf.itertuples(index=False)
            ]
            lens = np.array([c.size for c in chunks], dtype=np.int64)
            if (lens < dim).any():
                # degenerate tiny items: keep np.array_split semantics
                feats = [
                    np.array(
                        [p.mean() for p in np.array_split(c, dim)],
                        dtype=np.float32,
                    )
                    for c in chunks
                ]
            else:
                flat = np.concatenate(chunks)
                q, r = np.divmod(lens, dim)
                sizes = np.repeat(q[:, None], dim, axis=1)
                sizes[np.arange(dim)[None, :] < r[:, None]] += 1
                starts = np.roll(np.cumsum(sizes.ravel()), 1)
                starts[0] = 0
                sums = np.add.reduceat(flat.astype(np.float64), starts)
                means = (sums / sizes.ravel()).reshape(len(pdf), dim)
                feats = list(means.astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                }
            )

    return media.mapInPandas(fe, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, *, width: int, height: int, use_stub: bool = True
) -> DataFrame:
    """Resize = re-encode with new dims. Stubbed: payload passthrough with
    updated metadata (the real implementation re-encodes in the same UDF)."""
    if not use_stub:
        raise NotImplementedError("real resize requires an image codec")
    return media.withColumn("width", F.lit(width)).withColumn(
        "height", F.lit(height)
    )


def sample_frames(
    media: DataFrame, *, every_ms: int = 1000, use_stub: bool = True
) -> DataFrame:
    """video -> one row per sampled frame timestamp (explode on a JVM-side
    sequence; frame payload extraction stubbed as the original payload)."""
    if not use_stub:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
        "payload",
    )
