"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, ``mapInPandas`` kernel signatures. The actual media decode is
STUBBED (``decode_stub=True`` produces deterministic fake features;
``decode_stub=False`` raises NotImplementedError) because no image/audio
libraries exist in this container; swapping in PIL/librosa means replacing
ONE clearly-marked function body — the distributed plan is unchanged.

Design points that matter at 100 TB:
- media bytes travel in a single ``binary`` column; metadata (mime,
  width/height/duration) in typed columns so filters prune BEFORE decode;
- decode runs in ``mapInPandas`` (Arrow batches, bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``) so one huge blob
  cannot OOM a task beyond batch granularity;
- frame-sampling/resize emit one row per frame via the iterator contract,
  never materializing a whole video's frames in one pandas object.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def synthesize_media_table(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: binary payloads derived from the
    row id (sha256 bytes repeated) — same generator discipline as the
    code table: pure column expressions, reproducible at any scale."""
    i = F.col("id")
    payload = F.repeat(
        F.sha2(F.concat(F.lit(f"m{seed}-"), i.cast("string")), 256), 8
    )
    return spark.range(n).select(
        i.alias("media_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (i % 3 + 1).cast("int"),
        ).alias("mime"),
        ((i % 16 + 1) * 64).cast("int").alias("width"),
        ((i % 9 + 1) * 64).cast("int").alias("height"),
        ((i % 30 + 1) * 1000).cast("int").alias("duration_ms"),
        F.encode(payload, "utf-8").alias("data"),
    )


def _fake_feature(data: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: bytes → sha256 →
    dim floats in [0,1). Replace with a real model call."""
    out = []
    h = data
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 256.0 for b in h)
    return [float(x) for x in out[:dim]]


def extract_features(
    media: DataFrame, dim: int = 32, decode_stub: bool = True
) -> DataFrame:
    """Per-media feature vector via mapInPandas (Arrow batches).

    STUB: with ``decode_stub=True`` the 'decoder' is a deterministic
    hash-derived vector; ``decode_stub=False`` raises — wire a real
    image/audio library here (PIL.Image.open(io.BytesIO(buf)) etc.).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decode needs PIL/librosa/av — not in this container; "
            "replace _fake_feature and pass decode_stub=True semantics"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [ _fake_feature(d, dim) for d in pdf["data"] ],
                    "n_bytes": pdf["data"].map(len).astype("int32"),
                    "sha": pdf["data"].map(
                        lambda d: hashlib.sha256(d).hexdigest()
                    ),
                }
            )

    return media.select("media_id", "data").mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    The iterator contract emits frames incrementally — a 2-hour video
    yields rows without holding all frames in memory. STUB: frames are
    deterministic byte slices; a real implementation seeks the container
    (pyav) at each timestamp.
    """
    if not decode_stub:
        raise NotImplementedError("real frame decode needs pyav/ffmpeg")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, dur, data in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["data"]
            ):
                for k, ts in enumerate(range(0, int(dur), every_ms)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k)
                    rows["ts_ms"].append(ts)
                    # stub 'frame': deterministic slice of the payload
                    off = (k * 97) % max(1, len(data) - 16)
                    rows["frame"].append(bytes(data[off : off + 16]))
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("mime").startswith("video/"))
        .select("media_id", "duration_ms", "data")
        .mapInPandas(kernel, FRAME_SCHEMA)
    )
