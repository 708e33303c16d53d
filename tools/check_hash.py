"""Stricter mimic of the driver's hash-based correctness gate.

Unlike check_oracle.py (multiset compare with 6-digit float rounding),
this sorts rows the way the driver's canonicalizer does and requires
EXACT value equality — bit-identical floats, identical epoch seconds —
so a pass here predicts a driver hash_match, not just a value match.

Usage: python tools/check_hash.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from webloghunter_spark.session import get_spark, release_materialized

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> list[tuple]:
    """Sort columns by name, normalize dtypes (NOT values), sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif "datetime" in str(s.dtype):
            # normalize resolution first: Spark toPandas yields ns,
            # DuckDB/pandas-2 yields us — raw int64 views differ 1000x
            df[c] = s.astype("datetime64[ns]").astype("int64") // 10**9
        elif s.dtype.kind == "f":
            df[c] = s.astype("float64")  # exact — no rounding
        elif s.dtype.kind in "iu":
            df[c] = s.astype("int64")
        elif s.dtype.kind == "b":
            df[c] = s.astype("int64")
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="hash-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            release_materialized()
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            a, b = canon(sdf), canon(odf)
        except TypeError as e:
            print(f"FAIL  {name}: canon error (driver would ERR too): {e}")
            failures += 1
            continue
        if a == b:
            print(f"PASS  {name} ({len(sdf)} rows, exact)")
            continue
        failures += 1
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        # first differing row + max float delta for diagnosis
        first = next(
            (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
        )
        deltas = []
        for x, y in zip(a, b):
            for u, v in zip(x, y):
                if isinstance(u, float) and isinstance(v, float) and u != v:
                    deltas.append(abs(u - v))
        print(
            f"FAIL  {name}: exact mismatch at sorted row {first}: "
            f"spark={a[first]} oracle={b[first]}"
            + (f" (max float delta {max(deltas):.3g})" if deltas else "")
        )
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
