"""Time registry queries at two sf dirs (default sf0.1 vs the 32x
fixture) and print the per-query ratio — the SCALING.md row generator.

Usage: python tools/time_pair.py q1 [q2 ...] [--a /root/testdata/sf0.1]
                                 [--b /tmp/sf0.1_x32] [--repeats 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webloghunter_spark.benchqueries import QUERIES
from webloghunter_spark.session import get_spark, release_materialized


def run(spark, name, sf_dir, repeats):
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        times.append(round(time.perf_counter() - t0, 2))
        release_materialized()
        spark.catalog.clearCache()
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--a", default="/root/testdata/sf0.1")
    ap.add_argument("--b", default="/tmp/sf0.1_x32")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="time-pair")
    spark.read.parquet(f"{args.a}/region.parquet").count()
    out = {}
    for name in args.queries:
        ta = run(spark, name, args.a, args.repeats)
        tb = run(spark, name, args.b, args.repeats)
        out[name] = {"a_s": ta, "b_s": tb, "ratio": round(tb / ta, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
