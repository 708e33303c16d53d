"""As-of (point-in-time) join — an operator Spark's join zoo lacks.

Each left row is matched to the single right row with the greatest
right timestamp <= the left timestamp within the same key group (the
"latest version at event time" lookup: config versions, rule
revisions, price books, feature snapshots).

Implementation is the union-and-carry-forward pattern, NOT a range
join: tag both inputs, union on the shared key/time columns, and per
key group carry the last-seen right payload forward with
`last(..., ignorenulls)` over an ordered running frame, then keep left
rows. One shuffle on the key (both sides together), one sort — no
per-pair predicate evaluation and no range-join row explosion, so cost
is O((|L|+|R|) log) per key group regardless of how many left rows
each version covers. At 100 TB that is the difference between a
window over the unioned table and an interval join that fans out.

Tie rule: right rows sort BEFORE left rows at equal timestamps, so a
version effective exactly at the event time is visible (>= semantics,
matching DuckDB/QuestDB/kdb ASOF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the latest right row at-or-before its
    timestamp within `by` groups.

    value_cols: right columns to carry (default: all non-key,
    non-timestamp columns). how: 'inner' drops left rows with no prior
    version; 'left' keeps them with NULL payloads."""
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != right_ts]
    value_cols = list(value_cols)

    # The payload travels as ONE struct so the carried value is atomic:
    # per-column last(..., ignorenulls) would mix columns from different
    # right versions whenever a payload column is legitimately NULL, and
    # a NULL first payload column would defeat the matched test below.
    # The leading `_matched` marker keeps the struct non-empty (and the
    # match flag well-defined) even when value_cols is empty.
    payload = F.struct(
        F.lit(True).alias("_matched"),
        *[F.col(c) for c in value_cols],
    )
    payload_type = right.select(payload.alias("_v")).schema["_v"].dataType
    lhs = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(payload_type).alias("_v"),
        F.struct(*[c for c in left.columns]).alias("_row"),
    )
    rhs = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        payload.alias("_v"),
        F.lit(None).cast(lhs.schema["_row"].dataType).alias("_row"),
    )
    u = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_is_left",
        "_row",
        F.last("_v", ignorenulls=True).over(w).alias("_c"),
    ).filter(F.col("_is_left") == 1)
    if how == "inner":
        carried = carried.filter(F.col("_c").isNotNull())
    return carried.select(
        F.col("_row.*"),
        *[F.col("_c").getField(c).alias(c) for c in value_cols],
    )
