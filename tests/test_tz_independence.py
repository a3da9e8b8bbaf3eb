"""The two event-time driver queries must be bit-exact under ANY ambient
session timezone / parquet-NTZ-inference config.

Round-2 verdict root cause: ``queries()`` receives the DRIVER's
SparkSession (the repo's UTC pin in session.py never applies), and
``events.parquet``'s ``ts`` is NTZ-annotated — so any timestamp→epoch
conversion through the session timezone made ``events_window`` /
``user_sessions`` hash-fail in a non-UTC driver env. The fix
(``__spark_entry__._events_utc``) forces an NTZ read schema, derives
epoch micros arithmetically from the naive fields, and rebuilds event
time with ``timestamp_micros`` — this suite pins that contract with an
adversarial half-hour-offset zone (Asia/Kolkata) and both NTZ-inference
settings, compared exactly against the DuckDB oracle.
"""

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _canon(v):
    return round(v, 12) if isinstance(v, float) else v


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("tz", ["Asia/Kolkata", "America/New_York", "UTC"])
@pytest.mark.parametrize("ntz_infer", ["true", "false"])
@pytest.mark.parametrize("query", ["events_window", "user_sessions"])
def test_event_queries_tz_independent(spark, duck, tz, ntz_infer, query):
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntz_infer)
        sdf = entry.queries()[query](spark, SF)
        cols = sorted(sdf.columns)
        got = sorted(
            tuple(_canon(r[c]) for c in cols) for r in sdf.collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old_ntz)
    odf = duck.sql(entry.oracle_sql()[query]).df()
    want = sorted(
        tuple(_canon(v) for v in row)
        for row in odf[cols].itertuples(index=False, name=None)
    )
    assert got == want
