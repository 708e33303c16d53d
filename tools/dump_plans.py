"""Dump .explain("formatted") for registry queries to one file each.

Usage: python tools/dump_plans.py OUT_DIR [sf_dir] [query ...]

Used by the optimization rounds to commit before/after plans under
plans/rNN/. Queries that EXECUTE during construction (settled funnels,
iterative driver loops) run their stages here — this is a plan dump,
not a timing harness.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from webloghunter_spark.benchqueries import QUERIES
from webloghunter_spark.session import get_spark, release_materialized


def main() -> int:
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {type(e).__name__}: {e}"
        finally:
            release_materialized()
            spark.catalog.clearCache()
        (out_dir / f"{name}.txt").write_text(plan)
        print(name, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
