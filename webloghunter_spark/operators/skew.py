"""Skew mitigation operators.

AQE's skew-join splitting handles sort-merge joins automatically, but
two patterns still need explicit salting at 100 TB:

- a shuffle join where one side has a few pathological hot keys (one
  IP emitting 1% of all traffic puts 1 TB in a single task);
- a high-cardinality aggregation whose per-key state is too large for
  partial aggregation to absorb (collect_list/collect_set per hot key).

`salted_join` spreads each hot left-side key over `n_salt` partitions
by salting with a deterministic hash of a high-entropy column, and
replicates the right side once per salt value — correct for any
equi-join where the right side is small enough to replicate n_salt
times but too large (or disabled) to broadcast outright.

`salted_collect_set` two-phases a set aggregation: partial sets per
(key, salt) then a merge — the per-task state for a hot key shrinks by
n_salt while the result is identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    salt_src: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` (large, possibly skewed) with `right`
    (replicable) on column `on`, spreading each left key across
    `n_salt` shuffle partitions.

    `salt_src`: column whose hash spreads rows of a hot key (defaults
    to the whole left row via all columns — deterministic, no rand()
    so the plan stays reproducible/retry-safe)."""
    # Salting replicates the RIGHT side once per salt value, so any
    # join that emits unmatched right rows (right/full outer, right
    # semi/anti) would return each of them n_salt times.
    allowed = {"inner", "cross", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    if salt_src is None:
        src = F.hash(*[F.col(c) for c in left.columns])
    else:
        src = F.hash(F.col(salt_src) if isinstance(salt_src, str) else salt_src)
    l_salted = left.withColumn("_salt", F.pmod(src, F.lit(n_salt)).cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l_salted.join(r_salted, [on, "_salt"], how)
    return out.drop("_salt")


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salt: int = 8,
    salt_src: str | None = None,
    out_col: str = "values",
) -> DataFrame:
    """groupBy(keys).collect_set(value) in two phases so a hot key's
    set state is built across n_salt tasks, then merged."""
    src = F.hash(F.col(salt_src if salt_src else value_col))
    partial = (
        df.withColumn("_salt", F.pmod(src, F.lit(n_salt)))
        .groupBy(*keys, "_salt")
        .agg(F.collect_set(value_col).alias("_partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.array_distinct(F.flatten(F.collect_list("_partial"))).alias(out_col))
    )
