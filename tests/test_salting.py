"""Salted-join equivalence: same result as a plain join, hub rows spread."""

import pytest
from pyspark.sql import functions as F

from pygraphblas_spark.operators.salting import hot_keys, salted_join


def test_hot_keys(spark):
    df = spark.createDataFrame(
        [(0, i) for i in range(100)] + [(1, 0), (2, 0)], "k long, v long"
    )
    hot = [r["k"] for r in hot_keys(df, "k", threshold=10).collect()]
    assert hot == [0]


def test_salted_join_equals_plain_join(spark):
    # big side: hub key 7 with 500 rows + uniform tail
    rows = [(7, i) for i in range(500)] + [(i % 50, i) for i in range(500)]
    big = spark.createDataFrame(rows, "k long, payload long")
    small = spark.createDataFrame(
        [(i, float(i) * 2) for i in range(50)], "k long, w double"
    )
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", num_salts=8, hot_threshold=100)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_no_hot_keys_degenerates(spark):
    big = spark.createDataFrame([(i, i) for i in range(100)], "k long, p long")
    small = spark.createDataFrame([(i, i) for i in range(100)], "k long, w long")
    salted = salted_join(big, small, "k", num_salts=4, hot_threshold=1000)
    assert salted.count() == 100
