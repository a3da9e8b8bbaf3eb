"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, ``mapInPandas`` kernel signatures. Decode status:

- **REAL**: metadata extraction (``parse_media_metadata``) parses actual
  PNG IHDR headers and WAV containers with the pure stdlib
  (struct/zlib/wave) — no media libraries needed; the synthetic table
  can carry genuinely valid PNG/WAV payloads (``payloads='real'`` for
  header-level, ``payloads='raster'`` for full pixel rasters).
- **REAL**: pixel/sample decode into features
  (``extract_features(decode_stub=False)``): PNG via PIL when it is
  importable (import-gated — any format), else a pure-stdlib zlib
  decoder (8-bit gray/RGB/RGBA, non-interlaced, all 5 scanline
  filters); WAV via stdlib ``wave`` (8/16-bit PCM, channel-averaged).
- **STUBBED**: video frame decode (``sample_frames`` with
  ``decode_stub=False`` raises NotImplementedError) — container
  demuxing genuinely needs pyav/ffmpeg, absent here; swapping it in
  means replacing ONE clearly-marked function body — the distributed
  plan is unchanged.

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


def png_bytes(width: int, height: int, full_raster: bool = False) -> bytes:
    """Valid PNG (pure stdlib): signature + IHDR(w,h) + IDAT + IEND, all
    with correct CRCs. Header parsers (and ours) read width/height from
    IHDR bytes 16..24 big-endian.

    ``full_raster=True`` writes a complete 8-bit grayscale raster
    (deterministic ``(7x + 13y + 17) mod 256`` pattern, filter 0 per
    scanline) that any real decoder — PIL or the stdlib decoder below —
    can decode pixel-exactly; False keeps the cheap header-only payload
    for plumbing-scale tests."""
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
    if full_raster:
        import numpy as np

        x = np.arange(width, dtype=np.int64)
        rows = []
        for y in range(height):
            line = ((7 * x + 13 * y + 17) % 256).astype(np.uint8)
            rows.append(b"\x00" + line.tobytes())  # filter 0 per line
        idat = zlib.compress(b"".join(rows))
    else:
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
    metadata parser has real headers to read. ``payloads='raster'``:
    like 'real' but PNGs carry a complete deterministic pixel raster —
    the input for the REAL decode path (``extract_features`` with
    ``decode_stub=False``)."""
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
    raster = payloads == "raster"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = []
            for mime, w, h, dur, fake in zip(
                pdf["mime"], pdf["width"], pdf["height"],
                pdf["duration_ms"], pdf["data"],
            ):
                if mime == "image/png":
                    data.append(png_bytes(int(w), int(h), full_raster=raster))
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


def _png_decode_stdlib(data: bytes):
    """REAL PNG pixel decode with the stdlib alone (zlib inflate +
    scanline unfiltering): 8-bit depth, color types 0/2/6 (gray, RGB,
    RGBA), non-interlaced. Returns an (h, w) float32 grayscale array in
    [0, 1]. Anything fancier (16-bit, palette, Adam7) raises
    NotImplementedError pointing at PIL — the import-gated fast path."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            meta = (w, h, depth, ctype, interlace)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("no IHDR")
    w, h, depth, ctype, interlace = meta
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
        raise NotImplementedError(
            f"stdlib PNG decoder handles 8-bit gray/RGB/RGBA non-interlaced "
            f"only (got depth={depth} ctype={ctype} interlace={interlace}) — "
            "install PIL for the general path"
        )
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise ValueError("truncated PNG raster")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub: cumulative per channel
            rec = line.reshape(-1, nch).cumsum(axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential left-dependency
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                if f == 3:
                    rec[i] = (line[i] + (a + b) // 2) % 256
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (line[i] + pr) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    px = out.reshape(h, w, nch).astype(np.float32)
    gray = px[:, :, : min(nch, 3)].mean(axis=2)  # alpha excluded
    return gray / 255.0


def _decode_image(data: bytes):
    """(h, w) float grayscale in [0,1]: PIL when importable (any format),
    else the stdlib PNG decoder above.

    Both paths reduce color to the UNWEIGHTED channel mean (alpha
    excluded) — PIL's ``convert("L")`` would apply ITU-R 601 luma
    weights and make features depend on which decoder the container
    happens to have, so the PIL path decodes to RGB and applies the
    stdlib formula instead."""
    try:
        import io

        import numpy as np
        from PIL import Image  # import-gated: optional dependency

        px = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), dtype="float32"
        )
        return px.mean(axis=2) / 255.0
    except ImportError:
        return _png_decode_stdlib(data)


def _decode_audio(data: bytes):
    """Real WAV sample decode (stdlib wave + numpy): float samples in
    [-1, 1], channels averaged. 8-bit unsigned and 16-bit signed PCM."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data)) as wf:
        nch, width = wf.getnchannels(), wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 1:
        s = (np.frombuffer(frames, dtype=np.uint8).astype("float32") - 128.0) / 128.0
    elif width == 2:
        s = np.frombuffer(frames, dtype="<i2").astype("float32") / 32768.0
    else:
        raise NotImplementedError(
            f"{8 * width}-bit PCM — install soundfile for the general path"
        )
    if nch > 1:
        s = s.reshape(-1, nch).mean(axis=1)
    return s


def _real_feature(mime: str, data: bytes, dim: int) -> list[float]:
    """REAL decoded feature: images → per-chunk mean luminance of the
    decoded raster; audio → per-chunk RMS of the decoded samples. A
    stand-in for a model encoder, but computed from genuinely decoded
    pixels/samples, so any decode bug changes the output."""
    import numpy as np

    if mime == "image/png":
        vals = _decode_image(data).ravel()
        return [
            float(c.mean()) if len(c) else 0.0 for c in np.array_split(vals, dim)
        ]
    if mime == "audio/wav":
        s = _decode_audio(data)
        return [
            float(np.sqrt((c ** 2).mean())) if len(c) else 0.0
            for c in np.array_split(s, dim)
        ]
    raise NotImplementedError(
        f"decode of {mime!r} needs a container demuxer (pyav/ffmpeg) — "
        "not available; only image/png and audio/wav decode for real"
    )


def extract_features(
    media: DataFrame, dim: int = 32, decode_stub: bool = True
) -> DataFrame:
    """Per-media feature vector via mapInPandas (Arrow batches).

    ``decode_stub=True`` (default): the 'decoder' is a deterministic
    hash-derived vector — plumbing-scale tests, no payload decoding.

    ``decode_stub=False``: REAL decode — PNG pixels via PIL when
    importable, else the pure-stdlib zlib decoder (8-bit gray/RGB/RGBA,
    non-interlaced); WAV samples via stdlib ``wave``; video rows raise
    NotImplementedError (container demux needs pyav/ffmpeg). Features
    are chunk-pooled luminance means / sample RMS — replace
    ``_real_feature`` with a model call; the distributed plan is
    unchanged either way."""
    if decode_stub:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "feature": [_fake_feature(d, dim) for d in pdf["data"]],
                        "n_bytes": pdf["data"].map(len).astype("int32"),
                        "sha": pdf["data"].map(
                            lambda d: hashlib.sha256(d).hexdigest()
                        ),
                    }
                )

        return media.select("media_id", "data").mapInPandas(
            kernel, FEATURE_SCHEMA
        )

    def kernel_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [
                        _real_feature(m, bytes(d), dim)
                        for m, d in zip(pdf["mime"], pdf["data"])
                    ],
                    "n_bytes": pdf["data"].map(len).astype("int32"),
                    "sha": pdf["data"].map(
                        lambda d: hashlib.sha256(d).hexdigest()
                    ),
                }
            )

    return media.select("media_id", "mime", "data").mapInPandas(
        kernel_real, FEATURE_SCHEMA
    )


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
