"""Driver-style correctness gate, run locally: every queries() entry vs its
oracle_sql() in DuckDB at sf0.001 (fast) — row count, column names, and
order-insensitive value comparison."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in idx) for r in rows), key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    s_cmp = _rows_to_set(spark_cols, spark_rows)
    d_cmp = _rows_to_set(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s_cmp, d_cmp) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_no_oracle_query_runs(spark):
    """Weaker rows-only check for queries without oracle_sql (mirrors the
    driver's fallback). Since r12 EVERY registered query declares an
    oracle, so this passes vacuously — it stays as the net that catches
    any future no-oracle entry."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        assert QUERIES[name](spark, SF_DIR).count() > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
