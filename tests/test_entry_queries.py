"""Replicates the driver's oracle harness: every `queries()` entry runs on
Spark AND its `oracle_sql()` runs on DuckDB over the same parquet tables;
row count, column names, and exact values must match (order-insensitive).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("QWATCH_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connection():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Sort columns by name, then rows; floats kept exact (bitwise)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(v):
        return (v is None, str(type(v)), str(v))

    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(key(v) for v in r))


from qwatch_spark.queries import RETIRED_REGISTRY

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
# retired variants (registry consolidated to the driver's 50-slot window)
# keep full value-vs-oracle coverage here in pytest
RETIRED_Q = {n: fn for n, (fn, _) in RETIRED_REGISTRY.items()}
RETIRED_O = {n: sql for n, (_, sql) in RETIRED_REGISTRY.items() if sql}
ALL_Q = {**QUERIES, **RETIRED_Q}
ALL_O = {**ORACLES, **RETIRED_O}


def test_registry_fits_driver_window():
    assert len(QUERIES) <= 50


@pytest.mark.parametrize("name", [n for n in ALL_Q if n in ALL_O])
def test_query_matches_oracle(spark, name):
    sdf = ALL_Q[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection()
    res = con.execute(ALL_O[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sn, dn = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if not _rows_equal(a, b)
    ]
    assert not mismatches, f"{name}: first value mismatch {mismatches[0]}"


def _rows_equal(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if x != y:
                return False
        elif x != y:
            return False
    return True


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "last_ts", "last_value"]


def test_rows_only_queries_run(spark):
    for name in QUERIES:
        if name in ORACLES:
            continue
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name
