"""Skew handling: targeted salted joins for hub vertices.

The north rule calls for "salted shuffles for high-degree (hub) skew".
Where it matters: the per-iteration ``edges ⋈ rank`` join keys on the
vertex id; a hub with 10⁸ in/out-edges sends all its rows to one reducer
in a shuffled join. AQE's skew-join splitting handles sort-merge cases at
runtime; this module provides the *explicit, targeted* variant for when
the planner can't (e.g. the build side is already a broadcast candidate,
or deterministic behavior across iterations is wanted):

1. ``hot_keys``: one aggregation over the big side → keys above a degree
   threshold (broadcast-sized by construction — there are at most
   |big|/threshold of them).
2. ``salted_join``: hot rows of the big side get a salt derived from a
   *varying* column (hash of the row's other key — deterministic, no
   RNG); the small side's hot rows are replicated num_salts times; cold
   rows join normally; union. Each hub's rows now spread over
   ``num_salts`` reducers.

For aggregations (groupBy sum/min/count) salting is unnecessary — Spark's
partial (map-side) aggregation already absorbs key skew for algebraic
aggregates; only shuffled joins need it.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` — the hub list.
    One shuffle; output is tiny (≤ |df| / threshold rows)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") > threshold)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 16,
    hot: Optional[DataFrame] = None,
    hot_threshold: int = 1_000_000,
    salt_from: Optional[str] = None,
) -> DataFrame:
    """Inner join ``big ⋈ small on key`` with hub keys salted.

    - ``hot``: pre-computed hub-key DataFrame (else derived from ``big``
      with ``hot_threshold``).
    - ``salt_from``: a varying column of ``big`` to derive the salt from
      (defaults to the first non-key column) — deterministic, so repeated
      runs partition identically (matters for checkpoint resume).

    Returns the joined frame with the same columns as a plain inner join.
    """
    if hot is None:
        hot = hot_keys(big, key, hot_threshold)
    hot = F.broadcast(hot.select(F.col(key).alias("__hot_key")))

    salt_src = salt_from or next(c for c in big.columns if c != key)

    big_tag = big.join(hot, big[key] == F.col("__hot_key"), "left_outer")
    big_hot = big_tag.filter(F.col("__hot_key").isNotNull()).drop("__hot_key")
    big_cold = big_tag.filter(F.col("__hot_key").isNull()).drop("__hot_key")

    small_tag = small.join(hot, small[key] == F.col("__hot_key"), "left_outer")
    small_hot = small_tag.filter(F.col("__hot_key").isNotNull()).drop("__hot_key")
    small_cold = small_tag.filter(F.col("__hot_key").isNull()).drop("__hot_key")

    # hot path: salt the big side deterministically, replicate the small
    big_salted = big_hot.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(num_salts))
    )
    salts = big.sparkSession.range(num_salts).select(
        F.col("id").cast("long").alias("__salt")
    )
    small_salted = small_hot.crossJoin(F.broadcast(salts))
    hot_joined = big_salted.join(small_salted, [key, "__salt"]).drop("__salt")

    cold_joined = big_cold.join(small_cold, key)
    return cold_joined.unionByName(hot_joined)
