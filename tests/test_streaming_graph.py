"""Streaming incremental connected components (streaming/graph.py):
the incremental-equals-recompute theorem, the LSM state lifecycle, and
the end-to-end availableNow stream."""

import json
import os

from pyspark.sql import functions as F

from pygraphblas_spark.streaming.graph import (
    components_batch,
    compact_state,
    incremental_components_maintenance,
    read_state,
)
from pygraphblas_spark.algorithms import connected_components


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _full_cc(spark, pairs):
    e = _edges_df(spark, pairs)
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(e)
    return {
        r["id"]: r["component"] for r in verts.join(cc, "id").collect()
    }


# deterministic two-phase edge set: 5 blocks of 8 vertices (paths), then
# a second wave that bridges blocks 0-1 and 2-3 and adds a new vertex 99
_PHASE1 = [(b * 8 + i, b * 8 + i + 1) for b in range(5) for i in range(7)]
_PHASE2 = [(7, 8), (23, 24), (39, 99)]


def test_incremental_equals_recompute(spark):
    s1 = components_batch(_edges_df(spark, _PHASE1), None)
    s2 = components_batch(_edges_df(spark, _PHASE2), s1)
    got = {r["id"]: r["component"] for r in s2.collect()}
    want = _full_cc(spark, _PHASE1 + _PHASE2)
    assert got == want
    # the merges actually happened: blocks 0-1 and 2-3 share labels
    assert got[0] == got[15] == 0
    assert got[16] == got[31] == 16
    assert got[32] == got[39] == got[99] == 32


def test_untouched_components_pass_through_unchanged(spark):
    s1 = components_batch(_edges_df(spark, _PHASE1), None).persist()
    s2 = components_batch(_edges_df(spark, [(7, 8)]), s1)
    got = {r["id"]: r["component"] for r in s2.collect()}
    # block 4 (ids 32..39) untouched
    for i in range(32, 40):
        assert got[i] == 32
    assert got[15] == 0
    s1.unpersist()


def test_streaming_end_to_end_with_compaction(spark, tmp_path):
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, pairs):
        with open(stream_dir / name, "w") as f:
            for s, d in pairs:
                f.write(
                    json.dumps(
                        {"src": s, "dst": d, "ts": "2026-01-01T00:00:00"}
                    )
                    + "\n"
                )

    write_batch("b1.json", _PHASE1)
    incremental_components_maintenance(
        spark, str(stream_dir), state_root, ckpt
    )
    mid = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    assert mid == _full_cc(spark, _PHASE1)

    write_batch("b2.json", _PHASE2)
    incremental_components_maintenance(
        spark, str(stream_dir), state_root, ckpt
    )
    got = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    want = _full_cc(spark, _PHASE1 + _PHASE2)
    assert got == want

    # compaction folds deltas into base and preserves the resolve
    compact_state(spark, state_root)
    assert os.path.exists(f"{state_root}/base")
    assert not os.path.exists(f"{state_root}/delta")
    after = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    assert after == want

    # write-parallelism layout: the snapshot is hash-repartitioned on
    # the bucket key before the partitioned write, so each bucket dir
    # holds exactly ONE file (written by its own task) — without the
    # repartition the write runs on however few partitions the resolve
    # scan coalesced to, each spraying a small file into every dir
    import glob

    for sub, key in (("byid", "b"), ("compidx", "cb")):
        dirs = glob.glob(f"{state_root}/base/{sub}/{key}=*")
        assert dirs, f"no bucket dirs under {sub}"
        for d in dirs:
            files = glob.glob(f"{d}/*.parquet")
            assert len(files) == 1, f"{d}: {len(files)} files (want 1)"


def test_long_lived_query_chunked_with_inquery_compaction(spark, tmp_path):
    """One maintenance call, many micro-batches: max_files_per_trigger
    chunks the available files into per-file micro-batches inside a
    single query lifecycle (the production long-lived-query shape), and
    compact_every folds the delta log on cadence from INSIDE the query.
    Final state must equal the batch recompute, same as the
    query-per-batch shape."""
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, pairs):
        with open(stream_dir / name, "w") as f:
            for s, d in pairs:
                f.write(
                    json.dumps(
                        {"src": s, "dst": d, "ts": "2026-01-01T00:00:00"}
                    )
                    + "\n"
                )

    write_batch("b1.json", _PHASE1)
    write_batch("b2.json", _PHASE2)
    incremental_components_maintenance(
        spark,
        str(stream_dir),
        state_root,
        ckpt,
        compact_every=1,
        max_files_per_trigger=1,
    )
    got = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    assert got == _full_cc(spark, _PHASE1 + _PHASE2)
    # compact_every=1 and the last micro-batch compacting means the
    # delta log is folded and the bucketed base is live
    assert os.path.exists(f"{state_root}/base")
    assert not os.path.exists(f"{state_root}/delta")


def test_compaction_cadence_persists_across_calls(spark, tmp_path):
    """r4 ADVICE: a query-per-batch caller that processes fewer than
    ``compact_every`` micro-batches per CALL must still hit the
    compaction cadence — the pending-batch markers persist in the state
    root across calls, so the delta log cannot grow unboundedly (the
    pre-fix per-call counter never fired in that usage pattern)."""
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, pairs):
        with open(stream_dir / name, "w") as f:
            for s, d in pairs:
                f.write(
                    json.dumps(
                        {"src": s, "dst": d, "ts": "2026-01-01T00:00:00"}
                    )
                    + "\n"
                )

    write_batch("b1.json", _PHASE1)
    incremental_components_maintenance(
        spark, str(stream_dir), state_root, ckpt, compact_every=2
    )
    # one batch processed < cadence: delta only, one pending marker
    assert os.path.exists(f"{state_root}/delta")
    assert not os.path.exists(f"{state_root}/base")
    # one marker (ignore Hadoop local-FS .crc sidecars)
    assert [
        f for f in os.listdir(f"{state_root}/.pending") if not f.startswith(".")
    ] == ["b0"]

    write_batch("b2.json", _PHASE2)
    incremental_components_maintenance(
        spark, str(stream_dir), state_root, ckpt, compact_every=2
    )
    # second call's single batch reaches the cadence: folded + cleared
    assert os.path.exists(f"{state_root}/base")
    assert not os.path.exists(f"{state_root}/delta")
    assert not os.path.exists(f"{state_root}/.pending")
    got = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    assert got == _full_cc(spark, _PHASE1 + _PHASE2)


def test_compaction_crash_fallback_and_heal(spark, tmp_path):
    """Crash-safety of the compaction swap (ADVICE): if a crash strands
    the snapshot as ``base_old`` (rename base->base_old done, base_new
    not yet in place), readers fall back to it — no state loss — and the
    next compaction heals the layout."""
    import shutil

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    with open(stream_dir / "b1.json", "w") as f:
        for s, d in _PHASE1:
            f.write(json.dumps({"src": s, "dst": d, "ts": "2026-01-01T00:00:00"}) + "\n")
    incremental_components_maintenance(spark, str(stream_dir), state_root, ckpt)
    compact_state(spark, state_root)
    want = _full_cc(spark, _PHASE1)

    # simulate the mid-swap crash: live snapshot is base_old, no base
    os.rename(f"{state_root}/base", f"{state_root}/base_old")
    got = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    assert got == want

    # maintenance keeps working against the fallback snapshot
    with open(stream_dir / "b2.json", "w") as f:
        for s, d in _PHASE2:
            f.write(json.dumps({"src": s, "dst": d, "ts": "2026-01-01T00:00:01"}) + "\n")
    incremental_components_maintenance(spark, str(stream_dir), state_root, ckpt)
    want2 = _full_cc(spark, _PHASE1 + _PHASE2)
    got2 = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    assert got2 == want2

    # re-compaction heals: base back, base_old/delta gone, resolve intact
    compact_state(spark, state_root)
    assert os.path.exists(f"{state_root}/base")
    assert not os.path.exists(f"{state_root}/base_old")
    assert not os.path.exists(f"{state_root}/delta")
    got3 = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    assert got3 == want2

    # stale base_old alongside a live base (crash after step 4) is also
    # tolerated and cleaned by the next compaction
    shutil.copytree(f"{state_root}/base", f"{state_root}/base_old")
    got4 = {r["id"]: r["component"] for r in read_state(spark, state_root).collect()}
    assert got4 == want2
    compact_state(spark, state_root)
    assert not os.path.exists(f"{state_root}/base_old")


def test_batch_read_is_bucket_pruned(spark, tmp_path):
    """Per-batch state reads scan ONLY the base buckets of the affected
    set (VERDICT #4): with two components compacted into disjoint hash
    buckets, every parquet file in the other component's buckets is
    overwritten with garbage — an unpruned scan would throw; the pruned
    lookup returns exactly the affected component's rows."""
    import glob

    from pygraphblas_spark.streaming import graph as sg

    nb = 16
    comp_a = [(i, i + 1) for i in range(0, 7)]        # ids 0..7, label 0
    comp_b = [(i, i + 1) for i in range(100, 107)]    # ids 100..107, label 100
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    with open(stream_dir / "b1.json", "w") as f:
        for s, d in comp_a + comp_b:
            f.write(json.dumps({"src": s, "dst": d, "ts": "2026-01-01T00:00:00"}) + "\n")
    incremental_components_maintenance(
        spark, str(stream_dir), state_root, ckpt, n_buckets=nb
    )
    compact_state(spark, state_root, n_buckets=nb)

    def buckets(vals):
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        return {
            r["b"]
            for r in df.select(
                F.pmod(F.xxhash64("x"), F.lit(nb)).cast("int").alias("b")
            ).collect()
        }

    a_ids, b_ids = set(range(0, 8)), set(range(100, 108))
    a_id_bk, b_id_bk = buckets(a_ids), buckets(b_ids)
    a_cb, b_cb = buckets({0}), buckets({100})
    # the fixture must actually separate the two components somewhere
    assert b_id_bk - a_id_bk and b_cb != a_cb

    def corrupt(sub, col, bks):
        for k in bks:
            for fpath in glob.glob(f"{state_root}/base/{sub}/{col}={k}/*.parquet"):
                with open(fpath, "wb") as fh:
                    fh.write(b"not a parquet file")

    corrupt("byid", "b", b_id_bk - a_id_bk)
    corrupt("compidx", "cb", b_cb - a_cb)

    bv = spark.createDataFrame([(3,)], "id long")
    got = sg.batch_affected_state(spark, state_root, bv, n_buckets=nb)
    rows = {r["id"]: r["component"] for r in got.collect()}
    assert rows == {i: 0 for i in a_ids}
    # introspection: the scanned bucket lists never include B-only buckets
    assert set(sg.last_batch_read_info["id_buckets"]) <= a_id_bk | b_id_bk
    assert not (set(sg.last_batch_read_info["id_buckets"]) & (b_id_bk - a_id_bk))
    assert set(sg.last_batch_read_info["comp_buckets"]) == a_cb
    # member expansion resolves comp→buckets through the index and reads
    # exactly component A's id-buckets
    assert set(sg.last_batch_read_info["member_buckets"]) == a_id_bk


def test_retried_batch_append_is_idempotent(spark, tmp_path):
    """A crash-retried micro-batch re-appends identical delta rows; the
    resolve must still return one row per id."""
    state_root = str(tmp_path / "state")
    s1 = components_batch(_edges_df(spark, _PHASE1), None)
    delta = s1.select("id", "component", F.lit(0).cast("long").alias("seq"))
    delta.write.mode("append").parquet(f"{state_root}/delta")
    delta.write.mode("append").parquet(f"{state_root}/delta")  # the retry
    got = read_state(spark, state_root)
    assert got.count() == got.select("id").distinct().count()


# ---- property: incremental == full recompute on random two-phase graphs


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _uf_cc(pairs):
    """Union-find oracle: min-member component label per vertex."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in pairs:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}


_edge = st.tuples(
    st.integers(min_value=0, max_value=23), st.integers(min_value=0, max_value=23)
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(
    p1=st.lists(_edge, min_size=1, max_size=16),
    p2=st.lists(_edge, min_size=1, max_size=10),
)
def test_incremental_cc_property(spark, p1, p2):
    s1 = components_batch(_edges_df(spark, p1), None)
    s2 = components_batch(_edges_df(spark, p2), s1)
    got = {r["id"]: r["component"] for r in s2.collect()}
    assert got == _uf_cc(p1 + p2)
