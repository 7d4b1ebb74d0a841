"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: payloads are ``binary`` columns
with a typed metadata struct alongside; all per-item work happens in
``mapInPandas`` over Arrow batches so decode libraries run once per batch,
not per row, and partition sizes are controlled by bytes, not rows.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container; the
decode step is stubbed behind ``decoder=`` — the default deterministic fake
extracts real byte-level features (length, entropy-ish histogram stats) so
the Spark-side plumbing (schema, batching, partitioning) is fully
exercised and tested. Passing ``decoder="real"`` raises NotImplementedError
at plan-build time, by design.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", StructType([])),  # replaced below
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_std", DoubleType()),
        StructField("histogram", ArrayType(DoubleType())),
    ]
)


def fake_byte_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in 'decode': byte statistics + 16-bin histogram.

    Vectorized over the whole Arrow batch: all payloads are concatenated into
    one uint8 buffer and the per-row mean/std/histogram come from segmented
    ``np.bincount`` reductions — no per-row Python, which is the entire point
    of mapInPandas.
    """
    n = len(batch)
    payloads = [b"" if p is None else bytes(p) for p in batch["payload"]]
    sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    means = np.zeros(n)
    stds = np.zeros(n)
    hists = np.zeros((n, 16))
    nz = sizes > 0
    if nz.any():
        buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        row_of = np.repeat(np.arange(n), sizes)
        x = buf.astype(np.float64)
        sums = np.bincount(row_of, weights=x, minlength=n)
        sumsq = np.bincount(row_of, weights=x * x, minlength=n)
        means[nz] = sums[nz] / sizes[nz]
        stds[nz] = np.sqrt(
            np.maximum(sumsq[nz] / sizes[nz] - means[nz] ** 2, 0.0)
        )
        # bin b = byte >> 4, identical to np.histogram(bins=16, range=(0,256))
        flat = np.bincount(row_of * 16 + (buf >> 4), minlength=n * 16)
        hists[nz] = flat.reshape(n, 16)[nz] / sizes[nz, None]
    return pd.DataFrame(
        {
            "media_id": batch["media_id"].to_numpy(),
            "kind": batch["kind"].to_numpy(),
            "n_bytes": sizes,
            "byte_mean": means,
            "byte_std": stds,
            "histogram": [h.tolist() for h in hists],
        }
    )


def extract_media_features(
    media: DataFrame,
    decoder: str | Callable[[pd.DataFrame], pd.DataFrame] = "fake",
    batch_rows: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction over (media_id, kind, payload:binary).

    ``decoder="real"`` marks where PIL/librosa/ffmpeg would plug in — not
    available in this environment.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/ffmpeg, not present in "
            "this environment; pass decoder='fake' (deterministic byte "
            "features) or a callable(pd.DataFrame)->pd.DataFrame"
        )
    fn = fake_byte_features if decoder == "fake" else decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for start in range(0, len(b), batch_rows):
                yield fn(b.iloc[start : start + batch_rows])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing: slice the binary payload at fixed strides
    (stand-in for video frame extraction); one output row per frame."""
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.lit(max_frames - 1),
            F.floor(F.length("payload") / every_n_bytes).cast("int"),
        ),
    )
    return media.select(
        "media_id",
        "kind",
        F.posexplode(idx).alias("frame_no", "_i"),
        F.length("payload").alias("n_bytes"),
    ).select(
        "media_id",
        "kind",
        "frame_no",
        (F.col("frame_no") * every_n_bytes).alias("byte_offset"),
        "n_bytes",
    )
