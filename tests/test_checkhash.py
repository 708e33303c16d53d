"""Regression tests for the strict hash checker's dtype-kind gate.

Round 6 shipped SQL_BLOOM_AUDIT without the ``::BIGINT`` casts on its
``sum()`` columns; DuckDB HUGEINT -> pandas float64 made the driver hash
``2.0`` where Spark hashed ``2`` — value-identical, hash-red — and
tools/check_hash.py coerced the dtypes before comparing so its PASS did
not predict the driver row.  These tests pin the hardened behavior:
the pre-fix oracle must now FAIL the checker against the fixed one.
"""

import duckdb
import pandas as pd
import pytest

import webloghunter_spark.benchqueries as bq
from tools.check_hash import col_kinds, compare

SF_DIR = "/root/testdata/sf0.001"


def test_int_vs_float_kind_mismatch_fails():
    a = pd.DataFrame({"k": [1, 2], "n": pd.array([3, 4], dtype="int64")})
    b = pd.DataFrame({"k": [1, 2], "n": pd.array([3.0, 4.0], dtype="float64")})
    ok, msg = compare(a, b)
    assert not ok and "dtype-kind mismatch" in msg and "n:" in msg


def test_identical_frames_pass():
    a = pd.DataFrame({"k": [2, 1], "n": [4, 3]})
    b = pd.DataFrame({"k": [1, 2], "n": [3, 4]})  # row order is canon'd away
    ok, msg = compare(a, b)
    assert ok, msg


def test_empty_frames_skip_kind_check():
    a = pd.DataFrame({"n": pd.array([], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([], dtype="float64")})
    ok, _ = compare(a, b)
    assert ok


def test_prefix_bloom_audit_oracle_fails_kind_gate():
    """The round-6 pre-fix SQL (casts stripped) vs the fixed SQL:
    values identical, dtype kinds differ — the checker must fail it."""
    fixed_sql = bq.SQL_BLOOM_AUDIT
    assert "sum(bloom_hit)::BIGINT" in fixed_sql, "fixture drifted"
    prefix_sql = fixed_sql.replace(
        "sum(bloom_hit)::BIGINT", "sum(bloom_hit)"
    ).replace("coalesce(sum(exact_hit), 0)::BIGINT", "coalesce(sum(exact_hit), 0)")
    assert prefix_sql != fixed_sql

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    fixed = con.sql(fixed_sql).df()
    prefix = con.sql(prefix_sql).df()
    assert len(fixed) == len(prefix) > 0

    kinds_fixed = col_kinds(fixed)
    assert kinds_fixed["n_bloom_hits"] == "int"
    assert col_kinds(prefix)["n_bloom_hits"] == "float"

    ok, msg = compare(fixed, prefix)
    assert not ok and "dtype-kind mismatch" in msg

    ok, msg = compare(fixed, fixed)
    assert ok, msg
