"""Local mimic of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
the given sf dir, compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, values
normalized), and prints a PASS/FAIL line per query.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from webloghunter_spark.session import get_spark, release_materialized

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> list[tuple]:
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
            df[c] = s.round(6)
        elif s.dtype.kind in "iu":
            df[c] = s.astype("int64")
    return sorted(map(tuple, df.itertuples(index=False, name=None)))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
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
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            a, b = normalize(sdf), normalize(odf)
            if a != b:
                diff = [x for x in a if x not in b][:3]
                diffo = [x for x in b if x not in a][:3]
                problems.append(f"values differ; spark-only={diff} oracle-only={diffo}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
