"""One-off probe (round-6 VERDICT task 7): is an Arrow kernel for
top_token_frac worth it vs the linear-but-interpreted aggregate HOF?

Times rep_signals' top_token_bp column standalone over the 32x
documents fixture, three ways:
  expr  — current array_sort + F.aggregate run-length pass
  arrow — pandas_udf with a per-row Counter (Arrow transfer,
          Python loop per row)
Median of 3, printed as JSON. Decision rule per VERDICT: switch only
if arrow < expr / 1.5; otherwise record the numbers in SCALING.md and
keep the expr (codegen-adjacent, no Python workers)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from webloghunter_spark.functions.text import top_token_frac_expr
from webloghunter_spark.session import get_spark


def arrow_top_token_bp():
    import re

    import pandas as pd

    ws = re.compile(r"\s+")

    def one(text):
        if text is None:
            return 0
        t = text.strip()
        if not t:
            return 0
        toks = [x.lower() for x in ws.split(t)]
        from collections import Counter

        top = Counter(toks).most_common(1)[0][1]
        import math

        return math.floor(top * 10000.0 / len(toks) + 0.5)

    @F.pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    return _udf


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.1_x32"
    spark = get_spark(app_name="probe-topfrac")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)
    docs.count()  # warm

    udf = arrow_top_token_bp()
    variants = {
        "expr": lambda: docs.select(
            top_token_frac_expr("text").alias("bp")
        ),
        "arrow": lambda: docs.select(udf(F.col("text")).alias("bp")),
    }
    # parity first
    a = variants["expr"]().agg(F.sum("bp"), F.count("*")).collect()[0]
    b = variants["arrow"]().agg(F.sum("bp"), F.count("*")).collect()[0]
    assert tuple(a) == tuple(b), (tuple(a), tuple(b))

    out = {}
    for _ in range(3):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    med = {k: sorted(v)[1] for k, v in out.items()}
    med["ratio_expr_over_arrow"] = round(med["expr"] / med["arrow"], 2)
    med["parity_sum_bp"] = int(a[0])
    print(json.dumps(med))


if __name__ == "__main__":
    main()
