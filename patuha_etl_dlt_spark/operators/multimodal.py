"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as ``binary`` columns with a ``media_type``; the
decode/feature stage runs as ``mapInPandas`` (Arrow batch iterator — one
Python invocation per ~10k-row batch, never per row). The actual codec
libraries are NOT in this container, so the decode kernel is STUBBED:

- ``decode_kernel="fake"`` (default): a deterministic, pure-function-of-
  bytes fake decoder — real Spark plumbing (schema, batching, partition
  behavior) with fake pixels. Tests and oracles run against this.
- ``decode_kernel="pil"``/``"av"``: gated behind import-try; raises
  ``NotImplementedError`` here with a clear message.

The Spark-side contract — input/output schemas, batch iterator shape,
partition sizing — is the real deliverable; swapping the kernel for PIL/
pyav on a real cluster touches nothing else.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic pure function of the bytes — stands in for a real
    decoder. Dimensions derive from byte statistics; the 8-dim feature is
    a folded byte histogram."""
    if payload is None:
        return {"n_bytes": 0, "width": 0, "height": 0, "n_frames": 0, "feature": [0.0] * 8}
    b = np.frombuffer(bytes(payload), dtype=np.uint8)
    n = int(b.size)
    width = 16 + int(b[: min(n, 64)].sum() % 1024) if n else 0
    height = 16 + int(b[-min(n, 64):].sum() % 1024) if n else 0
    n_frames = 1 if media_type == "image" else 1 + n % 250
    hist = np.bincount(b % 8, minlength=8).astype(np.float64)
    feat = (hist / max(1, n)).round(6).astype(np.float32).tolist()
    return {"n_bytes": n, "width": width, "height": height, "n_frames": n_frames, "feature": feat}


def _real_decode(payload: bytes, media_type: str) -> dict:
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real media decoding needs PIL/pyav, which are not in this "
            "container; use decode_kernel='fake' (deterministic stub) — the "
            "Spark plumbing is identical"
        ) from None
    raise NotImplementedError("real decode kernel not wired in this environment")


def decode_media(
    df: DataFrame,
    decode_kernel: str = "fake",
    id_col: str = "media_id",
    type_col: str = "media_type",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode/feature-extract media columns via mapInPandas (Arrow batches).

    Output: DECODED_SCHEMA. Partitioning is preserved; batch size follows
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    kernel = _fake_decode if decode_kernel == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                [kernel(p, t) for p, t in zip(pdf[payload_col], pdf[type_col])]
            )
            out.insert(0, "media_type", pdf[type_col].values)
            out.insert(0, "media_id", pdf[id_col].values)
            yield out

    cols = df.select(
        F.col(id_col).alias(id_col),
        F.col(type_col).alias(type_col),
        F.col(payload_col).alias(payload_col),
    )
    return cols.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video media: expand (media_id, n_frames) into
    sampled frame indices — pure Spark (sequence/explode), no Python."""
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
