"""Edge derivations from the driver's TPC-H-ish testdata.

The correctness gate compares our Spark queries against DuckDB SQL on the
same parquet tables (TESTDATA.md). Graph algebra over edges derived from
relational tables is both a real use-case (bipartite entity graphs) and
SQL-expressible — so the GraphBLAS operator surface gets oracle-checked
end-to-end: degree = reduce_vector, co-occurrence = mxm(PLUS_PAIR),
element-wise = eadd/emult, etc.

Canonical derivations (kept deliberately simple so the SQL oracle is
unambiguous):

- ``order_part_edges``: lineitem → (l_orderkey, l_partkey) distinct —
  a bipartite order–part graph.
- ``customer_order_edges``: orders → (o_custkey, o_orderkey).
- ``supplier_part_edges``: lineitem → (l_suppkey, l_partkey) distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def order_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=l_orderkey, dst=l_partkey, val=1.0) distinct."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .distinct()
        .withColumn("val", F.lit(1.0))
    )


def customer_order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select(F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst"))
        .distinct()
        .withColumn("val", F.lit(1.0))
    )


def supplier_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
        .withColumn("val", F.lit(1.0))
    )
