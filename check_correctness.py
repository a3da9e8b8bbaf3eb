"""Local replica of the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, then compares row count,
schema (column names sorted), and the full multiset of row values.

Usage: python check_correctness.py [query ...]   (default: all with oracles)
"""

from __future__ import annotations

import sys
import time

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if isinstance(v, float):
        return round(v, 12)
    return v


def main() -> int:
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    wanted = sys.argv[1:] or [k for k in queries if k in oracles]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("check_correctness")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name in wanted:
        if name not in queries:
            print(f"{name}: UNKNOWN query")
            failures.append(name)
            continue
        t0 = time.time()
        sdf = queries[name](spark, SF_DIR)
        cols = sorted(sdf.columns)
        srows = [tuple(_canon(r[c]) for c in cols) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, {t_spark:.1f}s)")
            continue
        t0 = time.time()
        ores = con.sql(oracles[name])
        ocols_raw = ores.columns
        odata = ores.fetchall()
        # dtype-kind parity as PANDAS would fetch it: a driver harness
        # that hashes pandas frames sees DuckDB HUGEINT (e.g. any
        # SUM(BIGINT)) as float64 while Spark returns int64 — values
        # compare numerically equal here via fetchall() (HUGEINT →
        # Python int), so without this check the replica greenlights a
        # query the driver gate hash-fails (the 2-round-old
        # events_window / user_sessions red cells).
        import pandas as pd

        odtypes = con.sql(oracles[name]).df().dtypes
        # Spark-side kinds as PANDAS would fetch them, not as the Spark
        # schema declares them: toPandas() represents an integer column
        # containing any NULL as float64 (pandas has no nullable int64
        # by default), exactly like DuckDB's .df() does — so a nullable
        # int column lands float64 on BOTH sides in the driver harness
        # and is NOT a hash hazard (e.g. media_meta's parsed_* fields).
        # Modeling kinds from the schema alone flagged those as false
        # positives while the real hazard is int64-vs-float64 on
        # null-free columns (HUGEINT sums).
        skinds = {}
        for f in sdf.schema.fields:
            t = f.dataType.simpleString()
            if t in ("bigint", "int", "smallint", "tinyint"):
                ci = cols.index(f.name)
                has_null = any(r[ci] is None for r in srows)
                skinds[f.name] = "float" if has_null else "int"
            elif t in ("double", "float"):
                skinds[f.name] = "float"
            else:
                skinds[f.name] = "other"
        dtype_bad = [
            c
            for c in odtypes.index
            if c in skinds
            and skinds[c] != "other"
            and (
                ("int" if pd.api.types.is_integer_dtype(odtypes[c])
                 else "float" if pd.api.types.is_float_dtype(odtypes[c])
                 else "other")
                != skinds[c]
            )
        ]
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [tuple(_canon(r[i]) for i in order) for r in odata]
        t_duck = time.time() - t0
        ok_rows = len(srows) == len(orows)
        ok_schema = cols == ocols and not dtype_bad
        ok_vals = sorted(srows, key=repr) == sorted(orows, key=repr)
        status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if dtype_bad:
            print(f"    dtype-kind mismatch (spark vs oracle-as-pandas): {dtype_bad}")
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={'ok' if ok_schema else f'{cols} vs {ocols}'} "
            f"values={'ok' if ok_vals else 'MISMATCH'} "
            f"[spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
        )
        if status == "FAIL":
            if not ok_vals and ok_rows and ok_schema:
                sset = sorted(srows, key=repr)
                oset = sorted(orows, key=repr)
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                for a, b in diff:
                    print(f"    spark={a}  oracle={b}")
            failures.append(name)

    spark.stop()
    print(f"\n{len(wanted) - len(failures)}/{len(wanted)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
