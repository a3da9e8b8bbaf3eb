"""The two event-time driver queries must be bit-exact under ANY ambient
session timezone / parquet-NTZ-inference config — on BOTH engines.

Round-2/3 verdict root cause: ``queries()`` receives the DRIVER's
SparkSession (the repo's UTC pin in session.py never applies), and
``events.parquet``'s ``ts`` is NTZ-annotated — so any timestamp→epoch
conversion through a session timezone (Spark) OR a tz/version-sensitive
oracle construct (DuckDB ``epoch()``/``epoch_us()``/``//``) can shift
values on one side only. Round-4 fix: BOTH sides are pure BIGINT field
arithmetic (``_events_us`` / ``date_part``-mirrored SQL) with zero
timestamp-typed expressions after field extraction. This suite pins
that contract with an adversarial half-hour-offset Spark zone
(Asia/Kolkata), both NTZ-inference settings, AND a hostile DuckDB
session ``TimeZone`` — compared exactly.

It also pins the integer formulations semantically equal to Spark's
streaming-capable typed ops (``F.window`` / ``F.session_window``), so
replacing the typed ops in the gate queries didn't change semantics.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _canon(v):
    return round(v, 12) if isinstance(v, float) else v


def _duck(tz):
    con = duckdb.connect()
    con.sql(f"SET TimeZone='{tz}'")
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    return con


@pytest.mark.parametrize("duck_tz", ["UTC", "America/New_York"])
@pytest.mark.parametrize("tz", ["Asia/Kolkata", "America/New_York", "UTC"])
@pytest.mark.parametrize("ntz_infer", ["true", "false"])
@pytest.mark.parametrize("query", ["events_window", "user_sessions"])
def test_event_queries_tz_independent(spark, tz, ntz_infer, duck_tz, query):
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
    con = _duck(duck_tz)
    try:
        odf = con.sql(entry.oracle_sql()[query]).df()
    finally:
        con.close()
    want = sorted(
        tuple(_canon(v) for v in row)
        for row in odf[cols].itertuples(index=False, name=None)
    )
    assert got == want


def _collect_sorted(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_events_window_matches_typed_window_op(spark):
    """Integer hour-bucket formulation == F.window('1 hour') over the
    tz-independent LTZ column (the streaming code path's op)."""
    got = _collect_sorted(entry.queries()["events_window"](spark, SF))
    ev = entry._events_utc(spark, SF).withColumn(
        "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    )
    typed = (
        ev.groupBy(F.window("ts_utc", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws"),
            "event_type",
            "n",
            "cents",
        )
    )
    assert got == _collect_sorted(typed)


def test_user_sessions_matches_typed_session_window_op(spark):
    """lag+cumsum 30-min sessionization == F.session_window('30 minutes')
    (the stateful streaming-capable op): [t, t+gap) windows merge only on
    overlap, i.e. a new session starts exactly when gap >= 30 min."""
    got = _collect_sorted(entry.queries()["user_sessions"](spark, SF))
    ev = entry._events_utc(spark, SF).withColumn(
        "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    )
    typed = (
        ev.groupBy(
            F.session_window("ts_utc", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n",
            "cents",
        )
    )
    assert got == _collect_sorted(typed)


def test_events_sliding_matches_typed_window_op(spark):
    """Integer 15-min-bucket × 4-offset formulation == F.window('1 hour',
    '15 minutes') over the tz-independent LTZ column (the streaming code
    path's sliding-window op — each event lands in 4 windows)."""
    got = _collect_sorted(entry.queries()["events_sliding"](spark, SF))
    ev = entry._events_utc(spark, SF).withColumn(
        "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    )
    typed = (
        ev.groupBy(
            F.window("ts_utc", "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws"),
            "event_type",
            "n",
            "cents",
        )
    )
    assert got == _collect_sorted(typed)
