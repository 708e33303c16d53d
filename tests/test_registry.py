"""Driver-contract invariants over the whole query registry.

The driver canonicalizes results pandas-side: rows are sorted and
hashed, so a top-level array/map/struct column is unhashable there and
ERRs the correctness row even when values are right (round 3's
quantize_emb).  This test analyzes every registered query's schema —
plan-only, no execution — and rejects complex top-level columns.
"""

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_all_queries_have_oracle_or_documented_skip():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    missing = set(qs) - set(oracles)
    # every query is expected to carry an oracle; a deliberate omission
    # (non-SQL-expressible op) must be added here explicitly
    assert missing == set(), f"queries without oracle_sql: {sorted(missing)}"
    orphans = set(oracles) - set(qs)
    assert orphans == set(), f"oracles without queries: {sorted(orphans)}"


def test_no_complex_toplevel_columns(spark):
    """Schema-only sweep: driver canon requires scalar columns."""
    bad = {}
    for name, fn in entrymod.queries().items():
        schema = fn(spark, SF_DIR).schema
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert bad == {}, f"complex top-level columns break driver canon: {bad}"
