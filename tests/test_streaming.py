"""Structured Streaming tests — file sources + availableNow triggers, so
every run is deterministic and self-terminating."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pygraphblas_spark.streaming import (
    incremental_graph_maintenance,
    run_to_completion,
    stream_edges_from_files,
    streaming_out_degree,
    windowed_event_counts,
)


def write_edge_files(d, batches):
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        with open(os.path.join(d, f"b{i}.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


def test_streaming_out_degree(spark, tmp_path):
    src_dir = str(tmp_path / "edges")
    write_edge_files(
        src_dir,
        [
            [
                {"src": 0, "dst": 1, "val": 1.0, "ts": "2026-01-01T00:00:00Z"},
                {"src": 0, "dst": 2, "val": 1.0, "ts": "2026-01-01T00:00:01Z"},
                {"src": 1, "dst": 2, "val": 1.0, "ts": "2026-01-01T00:00:02Z"},
            ]
        ],
    )
    edges = stream_edges_from_files(spark, src_dir)
    assert edges.isStreaming
    deg = streaming_out_degree(edges)
    run_to_completion(
        deg, str(tmp_path / "ckpt"), output_mode="complete", query_name="deg"
    )
    got = {r["id"]: r["degree"] for r in spark.sql("SELECT * FROM deg").collect()}
    assert got == {0: 2, 1: 1}


def test_windowed_event_counts(spark, tmp_path):
    src_dir = str(tmp_path / "ev")
    write_edge_files(
        src_dir,
        [
            [
                {"src": 1, "dst": 1, "val": 1.0, "ts": "2026-01-01T00:00:10Z"},
                {"src": 1, "dst": 1, "val": 1.0, "ts": "2026-01-01T00:00:50Z"},
                {"src": 1, "dst": 1, "val": 1.0, "ts": "2026-01-01T00:01:10Z"},
            ]
        ],
    )
    ev = stream_edges_from_files(spark, src_dir)
    win = windowed_event_counts(ev, window="1 minute", watermark="2 minutes")
    run_to_completion(
        win, str(tmp_path / "ckpt2"), output_mode="complete", query_name="win"
    )
    rows = spark.sql("SELECT * FROM win ORDER BY window_start").collect()
    assert [r["n"] for r in rows] == [2, 1]


def test_incremental_graph_maintenance(spark, tmp_path):
    src_dir = str(tmp_path / "stream_in")
    table = str(tmp_path / "graph.parquet")
    write_edge_files(
        src_dir,
        [
            [
                {"src": 0, "dst": 1, "val": 1.0, "ts": "2026-01-01T00:00:00Z"},
                {"src": 0, "dst": 1, "val": 1.0, "ts": "2026-01-01T00:00:01Z"},
                {"src": 2, "dst": 3, "val": 1.0, "ts": "2026-01-01T00:00:02Z"},
            ]
        ],
    )
    incremental_graph_maintenance(spark, src_dir, table, str(tmp_path / "c1"))
    t1 = spark.read.parquet(table)
    assert t1.count() == 2  # in-batch dup removed

    # second stream batch: one duplicate of existing, one new
    write_edge_files(
        src_dir.replace("stream_in", "stream_in2"),
        [
            [
                {"src": 0, "dst": 1, "val": 9.0, "ts": "2026-01-01T00:01:00Z"},
                {"src": 4, "dst": 5, "val": 1.0, "ts": "2026-01-01T00:01:01Z"},
            ]
        ],
    )
    incremental_graph_maintenance(
        spark, src_dir.replace("stream_in", "stream_in2"), table, str(tmp_path / "c2")
    )
    t2 = spark.read.parquet(table)
    assert t2.count() == 3  # existing (0,1) not re-appended
    pairs = {(r["src"], r["dst"]) for r in t2.collect()}
    assert pairs == {(0, 1), (2, 3), (4, 5)}


def test_stateful_degree_tracker(spark, tmp_path):
    """applyInPandasWithState custom operator: running per-vertex degree
    and weight across micro-batches."""
    from pygraphblas_spark.streaming import stateful_degree_tracker

    src_dir = str(tmp_path / "edges_state")
    write_edge_files(
        src_dir,
        [
            [
                {"src": 1, "dst": 2, "val": 1.0, "ts": "2026-01-01T00:00:00"},
                {"src": 1, "dst": 3, "val": 2.0, "ts": "2026-01-01T00:00:01"},
                {"src": 2, "dst": 3, "val": 5.0, "ts": "2026-01-01T00:00:02"},
            ]
        ],
    )
    edges = stream_edges_from_files(spark, src_dir)
    tracked = stateful_degree_tracker(edges)
    run_to_completion(
        tracked, str(tmp_path / "ck_state"), output_mode="update",
        query_name="deg_state",
    )
    rows = {r["id"]: r for r in spark.sql("select * from deg_state").collect()}
    assert rows[1]["degree"] == 2 and rows[1]["weight"] == 3.0
    assert rows[2]["degree"] == 1 and rows[2]["weight"] == 5.0
    assert not rows[1]["expired"] and not rows[2]["expired"]


def test_incremental_dedup_maintenance(spark, tmp_path):
    # two sequential availableNow runs = two micro-batch rounds against a
    # persisted corpus: exact dup dropped, near-dup (one word changed)
    # LSH-detected and dropped, fresh doc kept
    from pygraphblas_spark.streaming import incremental_dedup_maintenance

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy", 1)  # high Jaccard near-dup
    fresh = "completely different content about spark streaming state stores " * 3

    def write_batch(name, rows):
        with open(stream_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # round 1: establish the corpus; 11 is an intra-batch exact dup of 10,
    # 12 an intra-batch NEAR dup of 10 (rule 3: larger id rejected)
    write_batch("b1.json", [
        {"doc_id": 10, "text": base, "ts": "2026-01-01T00:00:00"},
        {"doc_id": 11, "text": base.upper(), "ts": "2026-01-01T00:00:01"},
        {"doc_id": 12, "text": base.replace("dog", "cat", 1), "ts": "2026-01-01T00:00:02"},
    ])
    incremental_dedup_maintenance(spark, str(stream_dir), corpus, ckpt)
    docs = spark.read.parquet(f"{corpus}/docs")
    assert [r["doc_id"] for r in docs.collect()] == [10]

    # round 2: exact dup of 10, near-dup of 10, and a fresh doc
    write_batch("b2.json", [
        {"doc_id": 20, "text": base, "ts": "2026-01-01T01:00:00"},
        {"doc_id": 21, "text": near, "ts": "2026-01-01T01:00:01"},
        {"doc_id": 22, "text": fresh, "ts": "2026-01-01T01:00:02"},
    ])
    incremental_dedup_maintenance(spark, str(stream_dir), corpus, ckpt)
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{corpus}/docs").collect()
    )
    assert kept == [10, 22]
    # the bucket index only holds accepted docs
    bucket_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{corpus}/buckets").collect()
    }
    assert bucket_ids == {10, 22}
