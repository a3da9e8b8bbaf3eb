"""Physical-plan regression tests — the 100×-scale properties the
operators claim (column pruning to the scan, no cartesian products in
candidate joins, broadcast of small sides) asserted against the actual
Catalyst output, so a refactor that silently loses them fails loudly."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_edge_scan_prunes_columns(spark):
    """PageRank's edge derivation reads exactly the two key columns —
    a scan that drags the other 14 lineitem columns is wrong at 100 TB."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    e = li.select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    ).distinct()
    plan = _plan(e)
    assert "l_orderkey" in plan and "l_partkey" in plan
    assert "l_comment" not in plan and "l_shipdate" not in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan


def test_select_filter_pushes_to_scan(spark):
    """Matrix.select('>') over a parquet-backed matrix pushes the value
    predicate into the scan (PushedFilters), not a post-scan filter."""
    from pygraphblas_spark.matrix import Matrix

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("src"),
        F.col("l_partkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("val"),
    )
    m = Matrix(li, 1 << 40, 1 << 40, "FP64")
    plan = _plan(m.select(">", 40.0).df)
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity,40.0)" in plan


def test_minhash_candidates_no_cartesian(spark):
    """The LSH candidate join is keyed on (band, bucket) — never a
    cartesian/broadcast-nested-loop all-pairs product."""
    from pygraphblas_spark.pipeline.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    pairs = minhash_lsh_candidates(docs, verify_threshold=0.5)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_no_hot_term_window(spark):
    """Document frequency must come from an aggregate + join, never a
    count Window partitioned by the bare term key: a stop-word's every
    (doc,term) row would land in ONE window partition — a single-task
    hot spot AQE cannot split at corpus scale (r3 verdict item #3).
    The only allowed Window is the per-doc top-k (bounded by a doc's
    own vocabulary)."""
    from pygraphblas_spark.pipeline.text import tfidf_top_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    plan = _plan(tfidf_top_terms(docs, k=3))
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln or ln.strip().startswith("Window")]
    for ln in win_lines:
        # partition spec is the second bracketed list: Window [exprs], [part], [order]
        assert "doc_id" in ln, f"Window not partitioned by doc id: {ln}"


def test_incremental_dedup_no_corpus_side_shingles(spark):
    """The vs-corpus near-dup verify must evaluate its shingle
    expressions INLINE on the joined candidate pairs, never as a
    Project on the corpus relation: a shingle Project sits BELOW the
    join and recomputes shingles for EVERY stored doc every
    micro-batch — O(state) CPU per batch, quadratic over the stream's
    life (measured ~8x/batch degradation at a 150k-doc corpus before
    the fix)."""
    from pygraphblas_spark.pipeline.dedup import minhash_band_buckets
    from pygraphblas_spark.streaming.dedup import dedup_batch

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # the stored corpus carries (doc_id, norm_sha, text) — mirror it
    corpus = docs.filter(F.col("doc_id") < 40).withColumn(
        "norm_sha", F.sha2(F.col("text"), 256)
    )
    batch = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 80))
    accepted = dedup_batch(
        batch,
        corpus_docs=corpus,
        corpus_buckets=minhash_band_buckets(corpus),
    )
    plan = _plan(accepted)
    # The vs-corpus verify is the join keyed on old_id. Its Jaccard
    # condition must compute the shingles INLINE (the normalized-split
    # expression appears in the condition itself): the defective shape
    # referenced pre-projected array columns (sh_b#N) instead, and that
    # projection sat on the corpus relation below the join. The rule-3
    # intra-batch verify (keyed on id_b) may keep its projections —
    # both of its sides are batch-sized.
    verify_lines = [
        ln for ln in plan.splitlines()
        if "array_intersect" in ln and "old_id" in ln
    ]
    assert verify_lines, "vs-corpus verify join not found in the plan"
    for ln in verify_lines:
        assert "split(regexp_replace(lower(trim(" in ln, (
            f"corpus-side shingles pre-projected below the verify join "
            f"(O(state) CPU per micro-batch): {ln.strip()[:200]}"
        )


def test_stream_cc_base_resolve_is_shuffle_free(spark, tmp_path):
    """Resolving base+delta state (read_state, compaction) must never
    shuffle the base snapshot: only the cadence-bounded delta is
    last-writer-wins-reduced; the base is anti-joined against that
    small result as a BROADCAST join. The defective shape unioned
    base+delta and ran the groupBy(max seq) resolve over the whole
    state — a full-state shuffle per compaction (and per oracle read)
    that throttled the maintenance loop's N->4N scaling."""
    from pygraphblas_spark.streaming.graph import compact_state, read_state

    state = str(tmp_path / "state")
    rows = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 97).alias("component"),
        F.lit(0).cast("long").alias("seq"),
    )
    rows.write.mode("append").parquet(f"{state}/delta")
    compact_state(spark, state)  # -> base/{byid,compidx}, no delta
    spark.range(0, 50).select(
        "id", F.lit(0).cast("long").alias("component"),
        F.lit(1).cast("long").alias("seq"),
    ).write.mode("append").parquet(f"{state}/delta")

    resolved = read_state(spark, state)
    resolved.collect()  # finalize the adaptive plan
    plan = _plan(resolved)
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines, "base-vs-delta anti join not found in the plan"
    for ln in anti_lines:
        assert "BroadcastHashJoin" in ln, (
            f"base anti-joined via a shuffle join (full-state exchange "
            f"at 10^12-file scale): {ln.strip()}"
        )
    # and the byid snapshot never feeds an aggregate (the old shape)
    assert "SortMergeJoin" not in plan
