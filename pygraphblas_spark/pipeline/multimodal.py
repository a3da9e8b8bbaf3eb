"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, ``mapInPandas`` kernel signatures. Decode status:

- **REAL**: metadata extraction (``parse_media_metadata``) parses actual
  PNG IHDR headers and WAV containers with the pure stdlib
  (struct/zlib/wave) — no media libraries needed; the synthetic table
  can carry genuinely valid PNG/WAV payloads (``payloads='real'``).
- **STUBBED**: pixel/sample decode into features and video frame decode
  (``decode_stub=True`` produces deterministic fake features;
  ``decode_stub=False`` raises NotImplementedError) because no
  PIL/librosa/pyav exist in this container; swapping them in means
  replacing ONE clearly-marked function body — the distributed plan is
  unchanged.

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


#: WAV synthesis sample rate — 1 kHz makes nframes == duration_ms, so
#: parsed duration is exactly the generated one (integer-exact oracle).
WAV_SAMPLE_RATE = 1000


def png_bytes(width: int, height: int) -> bytes:
    """Minimal valid PNG (pure stdlib): signature + IHDR(w,h) + tiny
    IDAT + IEND, all with correct CRCs. Header parsers (and ours) read
    width/height from IHDR bytes 16..24 big-endian."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00")  # not a full raster; header-level valid
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def wav_bytes(duration_ms: int, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Valid mono 8-bit WAV of the given duration (stdlib ``wave``)."""
    import io
    import wave

    nframes = sample_rate * duration_ms // 1000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(b"\x80" * nframes)
    return buf.getvalue()


def synthesize_media_table(
    spark, n: int, seed: int = 42, payloads: str = "fake"
) -> DataFrame:
    """Deterministic media table; every column a function of the row id.

    ``payloads='fake'`` (default): cheap column-expression payloads
    (sha256 text bytes) — plumbing-scale tests. ``payloads='real'``:
    actual PNG/WAV bytes built in an Arrow-batched kernel (video rows
    keep a fake payload — no container muxer in the stdlib), so the
    metadata parser has real headers to read."""
    i = F.col("id")
    base = spark.range(n).select(
        i.alias("media_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (i % 3 + 1).cast("int"),
        ).alias("mime"),
        ((i % 16 + 1) * 64).cast("int").alias("width"),
        ((i % 9 + 1) * 64).cast("int").alias("height"),
        ((i % 30 + 1) * 1000).cast("int").alias("duration_ms"),
        F.encode(
            F.repeat(F.sha2(F.concat(F.lit(f"m{seed}-"), i.cast("string")), 256), 8),
            "utf-8",
        ).alias("data"),
    )
    if payloads == "fake":
        return base

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = []
            for mime, w, h, dur, fake in zip(
                pdf["mime"], pdf["width"], pdf["height"],
                pdf["duration_ms"], pdf["data"],
            ):
                if mime == "image/png":
                    data.append(png_bytes(int(w), int(h)))
                elif mime == "audio/wav":
                    data.append(wav_bytes(int(dur)))
                else:
                    data.append(bytes(fake))
            pdf = pdf.copy()
            pdf["data"] = data
            yield pdf

    return base.mapInPandas(kernel, MEDIA_SCHEMA)


PARSED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("parsed_width", T.IntegerType()),
        T.StructField("parsed_height", T.IntegerType()),
        T.StructField("parsed_duration_ms", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("parse_ok", T.BooleanType()),
    ]
)


def parse_media_metadata(media: DataFrame) -> DataFrame:
    """REAL (non-stub) metadata extraction from the binary payloads —
    pure-stdlib header parsing, no media libraries:

    - ``image/png``: width/height from the IHDR chunk (bytes 16..24,
      big-endian, after validating the 8-byte signature);
    - ``audio/wav``: duration from the ``wave`` module
      (nframes / framerate);
    - anything else (video containers need pyav/ffmpeg): passthrough
      with ``parse_ok=false`` — the still-stubbed remainder is explicit.

    Runs in mapInPandas (Arrow batches) — the same plan shape a real
    decoder would use; payload bytes never leave the executor."""
    import io
    import struct
    import wave

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in PARSED_SCHEMA.fields}
            for mid, mime, data in zip(pdf["media_id"], pdf["mime"], pdf["data"]):
                data = bytes(data)
                w = h = dur = None
                ok = False
                try:
                    if mime == "image/png" and data[:8] == b"\x89PNG\r\n\x1a\n":
                        w, h = struct.unpack(">II", data[16:24])
                        ok = True
                    elif mime == "audio/wav" and data[:4] == b"RIFF":
                        with wave.open(io.BytesIO(data)) as wf:
                            dur = round(
                                wf.getnframes() * 1000 / wf.getframerate()
                            )
                        ok = True
                except Exception:
                    ok = False
                rows["media_id"].append(mid)
                rows["mime"].append(mime)
                rows["parsed_width"].append(w)
                rows["parsed_height"].append(h)
                rows["parsed_duration_ms"].append(dur)
                rows["n_bytes"].append(len(data))
                rows["parse_ok"].append(ok)
            yield pd.DataFrame(rows)

    return media.select("media_id", "mime", "data").mapInPandas(
        kernel, PARSED_SCHEMA
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
