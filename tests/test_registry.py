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
    """Schema sweep: driver canon requires scalar columns.

    Mostly plan analysis, but NOT execution-free: several kNN-family
    builders collect() their query vector / centroids during
    construction, so this runs small Spark jobs against SF_DIR and
    must release the materialize() frames some builders persist."""
    from webloghunter_spark.session import release_materialized

    bad = {}
    for name, fn in entrymod.queries().items():
        schema = fn(spark, SF_DIR).schema
        release_materialized()
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    spark.catalog.clearCache()
    assert bad == {}, f"complex top-level columns break driver canon: {bad}"


def test_bench_isolates_failing_query(spark, monkeypatch, capsys, tmp_path):
    """One failing query must not kill the bench run (round 3 lost its
    whole bench gate to a single AnalysisException)."""
    import bench
    import webloghunter_spark.benchqueries as bq

    def boom(spark, sf_dir):
        raise RuntimeError("injected failure")

    monkeypatch.setitem(bq.QUERIES, "__boom__", boom)
    monkeypatch.setenv("WLH_BENCH_QUERIES", "train_split,__boom__")
    monkeypatch.setenv("WLH_BENCH_REPEATS", "1")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("WLH_BENCH_RUNS_PATH", str(tmp_path / "runs.json"))
    rc = bench.main()
    out = capsys.readouterr().out
    import json
    import os

    line = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert rc == 0
    # round 6: the stdout line is SUMMARY-ONLY (two rounds of driver
    # artifacts went unparseable from inlined per-query numbers);
    # per-query medians live in BENCH_runs.json
    assert "queries" not in line
    assert line["completed"] == 1
    assert line["failed"] == ["__boom__"]
    assert "injected failure" in line["errors"]["__boom__"]
    side = json.load(open(tmp_path / "runs.json"))
    assert side["queries"]["train_split"] is not None
    assert side["queries"]["__boom__"] is None


def test_bench_stdout_line_is_bounded_and_parseable(
    spark, monkeypatch, capsys, tmp_path
):
    """THE recurring round-4/5 failure: the driver tail-captures the
    last stdout line, and any per-query payload makes it grow with the
    registry until it truncates unparseable. Pin the contract: the
    line is summary-only, parseable, and small regardless of how many
    queries ran."""
    import json

    import bench

    monkeypatch.setenv("WLH_BENCH_QUERIES", "train_split,dedup_exact")
    monkeypatch.setenv("WLH_BENCH_REPEATS", "1")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("WLH_BENCH_RUNS_PATH", str(tmp_path / "runs.json"))
    rc = bench.main()
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    assert rc == 0
    parsed = json.loads(line)
    assert "queries" not in parsed and "runs" not in parsed
    assert set(parsed) <= {
        "metric", "value", "unit", "sf", "repeats",
        "completed", "failed", "errors",
    }
    # hard ceiling: even a 1000-query registry's summary fits a tail
    # capture (failed-name lists are the only registry-sized field,
    # and only on systemic failure)
    assert len(line) < 2000
