"""Shared SparkSession for the test suite — one JVM, local[*]."""

import pytest

from pygraphblas_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pygraphblas_spark-tests", cores="*", shuffle_partitions=8)
    yield s
