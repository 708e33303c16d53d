"""Cross-source duplicate removal (reference dataframe.py:161-203).

Exact semantics:
- Key = 8 normalized columns (timestamp, ip, method, request_uri, status,
  resp_size, user_agent, referrer); `source` is deliberately excluded.
- Normalization: status/resp_size coerced to int (non-numeric -> 0);
  string keys trimmed, lowercased, surrounding double-quotes stripped,
  literal 'nan' -> ''.
- A row is dropped iff it is NOT the first occurrence of its key (in
  input order) AND the key's group spans more than one distinct `source`
  — i.e. only cross-file duplicates are removed; genuine intra-file
  repeats are kept (they feed request_count later).

The pandas version's `keep='first'` depends on row order; here the caller
supplies an explicit `ordinal_col` (per-file line ordinal captured at
read time) so the result is deterministic under shuffles.

Scale: one hash shuffle on the normalized key; the multi-source test is
a min/max window aggregate over the same exchange (constant state per
group, no per-row set materialization), so dedup costs a single shuffle
end-to-end, no join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEDUP_KEY_COLS = (
    "timestamp",
    "ip",
    "method",
    "request_uri",
    "status",
    "resp_size",
    "user_agent",
    "referrer",
)
_NUMERIC_KEYS = {"status", "resp_size"}


def _norm_key(name: str) -> Column:
    if name in _NUMERIC_KEYS:
        return F.coalesce(F.col(name).try_cast("long"), F.lit(0))
    c = F.lower(F.trim(F.col(name).cast("string")))
    c = F.regexp_replace(c, r'^"|"$', "")
    return F.when(c == "nan", F.lit("")).otherwise(c)


def remove_cross_source_dups(
    df: DataFrame,
    key_cols: Sequence[str] = DEDUP_KEY_COLS,
    source_col: str = "source",
    ordinal_cols: Sequence[str] = ("source", "ordinal"),
) -> DataFrame:
    norm = [_norm_key(c).alias(f"_k_{c}") for c in key_cols]
    df = df.select("*", *norm)
    kcols = [f"_k_{c}" for c in key_cols]

    wk = Window.partitionBy(*kcols)
    wo = wk.orderBy(*ordinal_cols)
    # "spans more than one distinct source" == min(source) != max(source):
    # O(1) aggregation state per frame, where size(collect_set(...))
    # builds the full set per partition frame — unbounded for a
    # pathological hot duplicate key.
    df = df.withColumn("_rn", F.row_number().over(wo)).withColumn(
        "_multi_src",
        F.min(source_col).over(wk) != F.max(source_col).over(wk),
    )
    out = df.filter((F.col("_rn") == 1) | (~F.col("_multi_src")))
    return out.drop("_rn", "_multi_src", *kcols)
