"""Training-data pipeline tests: dedup, similarity, text analysis,
multimodal plumbing — over the driver's documents/embeddings tables and
controlled synthetic fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pygraphblas_spark.pipeline.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from pygraphblas_spark.pipeline.similarity import (
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
)
from pygraphblas_spark.pipeline.text import (
    add_fingerprint,
    add_language_id,
    add_quality,
    add_token_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    df.count()
    return df


def dup_docs(spark):
    """Controlled near/exact-dup corpus."""
    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.upper()),  # case-normalized dup of 0
        (3, base.replace("field", "meadow")),  # near dup
        (4, "completely different text about spark dataframes and shuffles here"),
        (5, "another unrelated document mentioning semirings and matrices only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---- text analysis ----


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is of to"),
            (1, "der Hund und die Katze ist das"),
            (2, "le chat et la maison les des"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in add_language_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_quality_and_tokens(docs):
    q = add_quality(add_token_counts(docs))
    row = q.filter(F.col("doc_id") == 0).first()
    assert 0.0 <= row["quality_score"] <= 1.0
    assert row["ws_tokens"] > 0 and row["bpe_tokens"] >= row["ws_tokens"]
    # token count consistency on all rows
    bad = q.filter(
        (F.col("ws_tokens") < 0) | (F.col("bpe_tokens") < F.col("ws_tokens"))
    ).count()
    assert bad == 0


def test_fingerprint_deterministic(docs):
    a = add_fingerprint(docs).select("doc_id", "fingerprint", "norm_sha")
    b = add_fingerprint(docs).select("doc_id", "fingerprint", "norm_sha")
    assert a.exceptAll(b).count() == 0
    # whitespace-insensitive
    spark = docs.sparkSession
    df = spark.createDataFrame(
        [(0, "a  b\tc"), (1, "a b c")], "doc_id long, text string"
    )
    fps = [r["fingerprint"] for r in add_fingerprint(df).collect()]
    assert fps[0] == fps[1]


# ---- dedup ----


def test_exact_duplicates(spark):
    d = exact_duplicates(dup_docs(spark))
    rows = d.collect()
    assert len(rows) == 1
    assert rows[0]["n_dups"] == 3  # 0, 1, 2 (case-normalized)
    assert rows[0]["keep_id"] == 0
    assert rows[0]["dup_ids"] == [0, 1, 2]


def test_minhash_finds_near_dups(spark):
    got = minhash_lsh_candidates(
        dup_docs(spark), num_perm=32, bands=8, verify_threshold=0.4
    )
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # the exact dups and the near dup must be found
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert (0, 3) in pairs  # near dup (one word changed)
    # unrelated docs are not paired
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_recall_vs_exact_jaccard(spark, docs):
    """LSH candidates (verified >= 0.5) ⊇ exact Jaccard >= 0.8 pairs —
    the banding (32 perms, 8 bands) has >99% recall at 0.8 similarity."""
    sample = docs.limit(120)
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(sample, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            sample, num_perm=32, bands=8, verify_threshold=0.5
        ).collect()
    }
    assert exact <= lsh


def test_simhash_near_pairs(spark):
    got = simhash_near_pairs(dup_docs(spark), max_hamming=6)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    # signatures of identical docs are equal
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(dup_docs(spark)).collect()}
    assert sigs[0] == sigs[1] == sigs[2]


def test_bucket_cap_bounds_adversarial_corpus(spark):
    """An adversarial low-entropy corpus — every doc IS boilerplate, so
    every LSH band/chunk bucket is one giant degenerate bucket — must
    produce bounded candidate counts when max_bucket_size is set (the
    100 TB quadratic-bucket guard), while the controlled corpus stays
    exactly correct with a generous cap."""
    n = 200
    rows = [(i, "common boilerplate header shared by every document") for i in range(n)]
    boiler = spark.createDataFrame(rows, "doc_id long, text string")

    # uncapped: all docs collide in every bucket -> ~n^2/2 verified pairs
    capped = minhash_lsh_candidates(
        boiler, num_perm=32, bands=8, verify_threshold=None, max_bucket_size=50
    )
    assert capped.count() == 0  # every bucket oversized -> all dropped

    sim_capped = simhash_near_pairs(boiler, max_hamming=3, max_bucket_size=50)
    assert sim_capped.count() == 0

    # a generous cap on the normal corpus changes nothing (exactness)
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            dup_docs(spark), num_perm=32, bands=8, verify_threshold=0.4
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            dup_docs(spark),
            num_perm=32,
            bands=8,
            verify_threshold=0.4,
            max_bucket_size=100,
        ).collect()
    }
    assert got == want

    sim_want = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(dup_docs(spark), max_hamming=6).collect()
    }
    sim_got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            dup_docs(spark), max_hamming=6, max_bucket_size=100
        ).collect()
    }
    assert sim_got == sim_want

    # mixed corpus: boilerplate flood + one genuine near-dup pair that
    # differs from the flood — the pair survives a cap that kills the flood
    mixed_rows = rows + [
        (1000, "a genuinely unique document about sparse matrix semirings kernels"),
        (1001, "a genuinely unique document about sparse matrix semiring kernels"),
    ]
    mixed = spark.createDataFrame(mixed_rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            mixed, num_perm=32, bands=8, verify_threshold=0.4, max_bucket_size=50
        ).collect()
    }
    assert (1000, 1001) in pairs
    assert all(a >= 1000 for a, _ in pairs)  # flood contributed nothing


def test_lsh_topk_bucket_cap(spark, emb):
    """ANN LSH with a degenerate base: cap drops oversized buckets but
    sparse buckets still produce ranked neighbors; generous cap == exact."""
    q = emb.limit(4)
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in lsh_bucketed_topk(emb, q, k=3, planes=6, tables=4).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in lsh_bucketed_topk(
            emb, q, k=3, planes=6, tables=4, max_bucket_size=10**6
        ).collect()
    }
    assert got == want
    # a cap of 0 drops every bucket -> no candidates at all
    empty = lsh_bucketed_topk(
        emb, q, k=3, planes=6, tables=4, max_bucket_size=0
    )
    assert empty.count() == 0


def test_ngram_jaccard_exact(spark):
    got = ngram_jaccard_pairs(dup_docs(spark), threshold=0.99)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got.collect()}
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 2)] == 1.0


# ---- similarity search ----


def test_cosine_topk_vs_numpy(spark, emb):
    q = emb.limit(5)
    got = cosine_topk_bruteforce(emb, q, k=3)
    rows = got.collect()
    # numpy oracle
    pdf = emb.toPandas().set_index("vec_id")
    V = np.array(pdf["embedding"].tolist())
    ids = pdf.index.to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T
    for r in rows:
        qi = np.where(ids == r["query_id"])[0][0]
        s = sims[qi].copy()
        s[qi] = -2  # exclude self
        order = np.lexsort((ids, -np.round(s, 6)))
        expect_id = ids[order[r["rank"] - 1]]
        assert r["neighbor_id"] == expect_id
        assert abs(r["cos"] - round(float(s[order[r["rank"] - 1]]), 6)) < 2e-6


def test_lsh_topk_schema_and_recall(spark, emb):
    q = emb.limit(10)
    exact = cosine_topk_bruteforce(emb, q, k=1)
    approx = lsh_bucketed_topk(emb, q, k=1, planes=4, tables=8)
    assert approx.columns == exact.columns
    e1 = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a1 = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # approximate: demand >= 50% top-1 recall with these params
    assert len(e1 & a1) >= len(e1) // 2


def test_embedding_near_duplicates(spark, emb):
    """LSH-bucketed cosine near-dup: precision 1 (exact verify), good
    recall vs the exact all-pairs threshold set."""
    from pygraphblas_spark.pipeline.dedup import embedding_near_duplicates
    from pygraphblas_spark.pipeline.similarity import cosine_similarity

    thr = 0.8
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_similarity(F.col("va"), F.col("vb")).alias("cos"),
        )
        .filter(F.col("cos") >= thr)
        .collect()
    }
    got_rows = embedding_near_duplicates(
        emb, threshold=thr, planes=4, tables=8
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in got_rows}
    assert got <= exact  # precision 1 (allowing rounding at boundary)
    if exact:
        assert len(got & exact) >= max(1, len(exact) // 2)  # recall >= 50%


def test_ivf_topk_schema_and_recall(spark, emb):
    from pygraphblas_spark.pipeline.similarity import ivf_topk

    q = emb.limit(10)
    exact = cosine_topk_bruteforce(emb, q, k=1)
    approx = ivf_topk(emb, q, k=1, n_centroids=8, nprobe=4)
    assert approx.columns == exact.columns
    e1 = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a1 = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # probing half the lists: demand >= 50% top-1 recall
    assert len(e1 & a1) >= len(e1) // 2
    # nprobe == n_centroids degenerates to exact search
    full = ivf_topk(emb, q, k=1, n_centroids=8, nprobe=8)
    f1 = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f1 == e1


# ---- multimodal plumbing ----


def test_multimodal_features(spark):
    from pygraphblas_spark.pipeline.multimodal import (
        extract_features,
        sample_frames,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, 30)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["feature"])
    # deterministic
    again = {r["media_id"]: r["sha"] for r in extract_features(media, dim=16).collect()}
    assert {r["media_id"]: r["sha"] for r in rows} == again

    frames = sample_frames(media, every_ms=5000)
    fr = frames.collect()
    assert len(fr) > 0
    assert all(len(r["frame"]) == 16 for r in fr)
    # only video rows produce frames
    vids = {r["media_id"] for r in media.filter(F.col("mime") == "video/mp4").collect()}
    assert {r["media_id"] for r in fr} <= vids

    # real decode of a video row is still honestly gated: container
    # demux needs pyav/ffmpeg — the executor-side kernel raises
    import pytest as _pytest

    vids_only = media.filter(F.col("mime") == "video/mp4")
    with _pytest.raises(Exception, match="pyav"):
        extract_features(vids_only, decode_stub=False).collect()

    with _pytest.raises(NotImplementedError):
        sample_frames(media, decode_stub=False)


def test_real_decode_features(spark):
    """decode_stub=False REALLY decodes: PNG pixels (stdlib zlib decoder
    in this container; PIL where importable) and WAV samples. The oracle
    recomputes the pooled features from the generative pixel/sample
    model directly in numpy."""
    import numpy as np

    from pygraphblas_spark.pipeline.multimodal import (
        extract_features,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, 24, payloads="raster").filter(
        F.col("mime") != "video/mp4"
    )
    meta = {r["media_id"]: r for r in media.select(
        "media_id", "mime", "width", "height").collect()}
    got = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media, dim=8, decode_stub=False).collect()
    }
    assert set(got) == set(meta)
    for mid, row in meta.items():
        if row["mime"] == "image/png":
            w, h = row["width"], row["height"]
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            px = ((7 * x + 13 * y + 17) % 256).astype("float32") / 255.0
            want = [float(c.mean()) for c in np.array_split(px.ravel(), 8)]
        else:  # WAV payload is constant 0x80 == sample 0.0 → RMS 0
            want = [0.0] * 8
        assert got[mid] == pytest.approx(want, abs=1e-6), (mid, row["mime"])


def test_stdlib_png_decoder_all_filters():
    """The stdlib decoder reconstructs every PNG scanline filter (0-4)
    and RGB/RGBA, verified by forward-encoding a known pixel array."""
    import struct
    import zlib

    import numpy as np

    from pygraphblas_spark.pipeline.multimodal import _png_decode_stdlib

    rng = np.random.default_rng(7)

    def encode(px, ctype, filters):
        h, w, nch = px.shape
        stride = w * nch
        flat = px.reshape(h, stride).astype(np.int32)
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int32)
        for y2 in range(h):
            line, f = flat[y2], filters[y2 % len(filters)]
            enc = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) % 256
            raw += bytes([f]) + enc.astype(np.uint8).tobytes()
            prev = line

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    for ctype, nch in ((0, 1), (2, 3), (6, 4)):
        px = rng.integers(0, 256, size=(9, 7, nch), dtype=np.uint8)
        data = encode(px, ctype, filters=[0, 1, 2, 3, 4])
        gray = _png_decode_stdlib(data)
        want = px[:, :, : min(nch, 3)].astype("float32").mean(axis=2) / 255.0
        assert np.allclose(gray, want, atol=1e-6), (ctype, nch)


def test_pil_path_matches_stdlib_decoder():
    """Where PIL is installed, the import-gated fast path must agree
    with the stdlib decoder (skipped in containers without PIL)."""
    import numpy as np

    pytest.importorskip("PIL")
    from pygraphblas_spark.pipeline.multimodal import (
        _decode_image,
        _png_decode_stdlib,
        png_bytes,
    )

    data = png_bytes(33, 21, full_raster=True)
    assert np.allclose(_decode_image(data), _png_decode_stdlib(data), atol=1e-6)

    # COLOR raster: PIL's convert("L") applies ITU-R 601 luma weights and
    # would diverge from the stdlib channel mean (pure red: 0.299 vs 1/3);
    # _decode_image must apply the same unweighted mean on both paths.
    import struct
    import zlib

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(px.shape[0]))

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", px.shape[1], px.shape[0], 8, 2, 0, 0, 0)
    color = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    want = px.astype("float32").mean(axis=2) / 255.0
    assert np.allclose(_decode_image(color), want, atol=1e-6)
    assert np.allclose(_png_decode_stdlib(color), want, atol=1e-6)


def test_winnowing_fingerprints(spark):
    """Winnowing guarantee: documents sharing a long substring share at
    least one fingerprint; disjoint documents share none."""
    from pygraphblas_spark.pipeline.text import add_winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (0, f"PREFIX A {shared} SUFFIX ONE"),
            (1, f"other start {shared} different end"),
            (2, "zzzz completely unrelated qqqq content 1234"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: set(r["winnow_fps"])
        for r in add_winnowing_fingerprints(docs, k=8, window=4).collect()
    }
    assert rows[0] & rows[1]            # shared substring -> shared fp
    assert not (rows[0] & rows[2])      # unrelated -> disjoint
    assert not (rows[1] & rows[2])
    # deterministic across recomputation
    rows2 = {
        r["doc_id"]: set(r["winnow_fps"])
        for r in add_winnowing_fingerprints(docs, k=8, window=4).collect()
    }
    assert rows == rows2


def test_media_real_payload_parse_roundtrip(spark):
    """REAL (non-stub) header parsing: synthesize valid PNG/WAV bytes,
    parse them back with the stdlib — parsed metadata must equal the
    generative model's."""
    from pygraphblas_spark.pipeline.multimodal import (
        parse_media_metadata,
        png_bytes,
        synthesize_media_table,
        wav_bytes,
    )

    # unit sanity on the byte builders
    import io
    import struct
    import wave as wave_mod
    import zlib

    b = png_bytes(320, 200)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    assert struct.unpack(">II", b[16:24]) == (320, 200)
    # IHDR CRC is genuinely valid
    ln = struct.unpack(">I", b[8:12])[0]
    tag_payload = b[12 : 16 + ln]
    crc = struct.unpack(">I", b[16 + ln : 20 + ln])[0]
    assert zlib.crc32(tag_payload) & 0xFFFFFFFF == crc
    with wave_mod.open(io.BytesIO(wav_bytes(2500))) as wf:
        assert round(wf.getnframes() * 1000 / wf.getframerate()) == 2500

    media = synthesize_media_table(spark, 30, seed=42, payloads="real")
    parsed = {r["media_id"]: r for r in parse_media_metadata(media).collect()}
    assert len(parsed) == 30
    for i in range(30):
        r = parsed[i]
        if i % 3 == 0:  # png
            assert r["parse_ok"]
            assert r["parsed_width"] == (i % 16 + 1) * 64
            assert r["parsed_height"] == (i % 9 + 1) * 64
            assert r["parsed_duration_ms"] is None
        elif i % 3 == 1:  # wav
            assert r["parse_ok"]
            assert r["parsed_duration_ms"] == (i % 30 + 1) * 1000
        else:  # video: explicitly still stubbed
            assert not r["parse_ok"]


def test_redact_pii(spark):
    from pygraphblas_spark.pipeline.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a@b.io or call +1 555-123-4567; host 10.0.0.7 ok")],
        "doc_id long, text string",
    )
    r = redact_pii(df).first()
    assert r["n_emails"] == 1 and r["n_phones"] == 1 and r["n_ips"] == 1
    assert "<EMAIL>" in r["text_redacted"]
    assert "<PHONE>" in r["text_redacted"]
    assert "<IP>" in r["text_redacted"]
    assert "a@b.io" not in r["text_redacted"]


def test_repetition_flags(spark):
    from pygraphblas_spark.pipeline.text import add_repetition_flags

    df = spark.createDataFrame(
        [
            (1, "spam\nspam\nspam\nham"),      # 2/4 duplicate lines
            (2, "all lines differ\nhere"),
            (3, "a a a b"),                     # 2/4 duplicate words
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in add_repetition_flags(df).collect()}
    assert got[1]["dup_line_frac"] == 0.5
    assert got[2]["dup_line_frac"] == 0.0
    assert got[3]["dup_word_frac"] == 0.5


def test_ngram_containment(spark):
    from pygraphblas_spark.pipeline.dedup import ngram_containment

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, "quick brown fox jumps over")],  # fully contained in doc 1
        "probe_id long, text string",
    )
    got = {
        (r["doc_id"], r["probe_id"]): r["containment"]
        for r in ngram_containment(docs, probes).collect()
    }
    assert got[(1, 100)] == 1.0
    assert (2, 100) not in got or got[(2, 100)] == 0.0


def test_ivf_kmeans_refinement(spark):
    # Lloyd rounds must (a) not change the full-probe result (degenerate
    # exact case) and (b) reduce mean quantization error vs raw samples
    import numpy as np

    from pygraphblas_spark.pipeline.similarity import (
        _kmeans_refine,
        _sample_centroids,
        ivf_topk,
    )

    rng = np.random.RandomState(3)
    centers = rng.randn(4, 8) * 4
    vecs = [
        (i, (centers[i % 4] + rng.randn(8) * 0.3).tolist()) for i in range(80)
    ]
    base = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = base.filter(F.col("vec_id") < 4)

    exact0 = sorted(
        map(tuple, ivf_topk(base, queries, k=3, n_centroids=6, nprobe=6).collect())
    )
    exact2 = sorted(
        map(
            tuple,
            ivf_topk(
                base, queries, k=3, n_centroids=6, nprobe=6, kmeans_iters=2
            ).collect(),
        )
    )
    assert exact0 == exact2  # full probe is exact regardless of centroids

    b = base.select(F.col("vec_id").alias("__id"), F.col("embedding").alias("__v"))
    c0 = _sample_centroids(base, 6, "vec_id", "embedding")
    c2 = _kmeans_refine(b, c0, 2, "embedding")

    m = np.array([v for _, v in vecs])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)

    def qerr(c):
        return float(np.mean(1.0 - (m @ c.T).max(axis=1)))

    assert qerr(c2) <= qerr(c0) + 1e-12


def test_tfidf_top_terms(spark):
    from pygraphblas_spark.pipeline.text import tfidf_top_terms
    import math

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple cherry"),
            (1, "banana cherry cherry date"),
            (2, "apple apple apple"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["term"], r["tfidf"]))
    # every doc returns at most k rows, ordered deterministically
    assert all(len(v) <= 2 for v in got.values())
    n = 3
    idf = lambda df_: math.log((n + 1) / (df_ + 1)) + 1
    # doc 2: only one distinct term
    assert [t for t, _ in got[2]] == ["apple"]
    assert math.isclose(got[2][0][1], round(3 * idf(2), 6), rel_tol=1e-9)
    # doc 0: apple tf=2 (df=2), banana tf=1 (df=2), cherry tf=1 (df=2);
    # top-2 = apple then banana (tie banana/cherry broken by term asc)
    assert [t for t, _ in got[0]] == ["apple", "banana"]
