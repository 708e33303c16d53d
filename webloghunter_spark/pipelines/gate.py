"""Document intake gate: the composed keep/drop decision of a
training-corpus filter chain (C4 / Gopher / RefinedWeb-style rule
stacks): length bounds, encoding damage, heuristic quality, and
corpus-LM likelihood, applied in a FIXED order with the first failing
rule recorded as the drop reason — the audit trail a data pipeline
needs to answer "why did this document disappear".

Engine-portability: every threshold compare is integer arithmetic
(token counts, quality basis points, and an integer cross-multiply for
the non-printable ratio — npr * 10000 > max_bp * nchar — so no
double-rounding boundary can diverge between engines); only the LM
rule compares a rounded double.

Scale shape: one narrow whole-stage-codegen pass over the text for the
counting rules (no shuffle), plus — only when the LM rule is enabled —
the bigram_logprob join (its own scale notes in functions/lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webloghunter_spark.functions.lm import bigram_logprob
from webloghunter_spark.functions.text import (
    NON_PRINTABLE_ASCII,
    quality_bp_expr,
    token_count_expr,
)

GATE_RULES = ("too_short", "too_long", "encoding", "low_quality", "low_lm")


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_tokens: int = 5000,
    max_nonprintable_bp: int = 1000,
    min_quality_bp: int = 5000,
    min_avg_ll: float | None = None,
    lm_alpha: float = 0.5,
) -> DataFrame:
    """(id, keep, reason): keep=false rows carry the FIRST failing rule
    from GATE_RULES; keep=true rows have reason=''.

    `min_avg_ll=None` disables the LM rule (and its join entirely —
    the gate is then a single scan pass)."""
    c = F.col(text_col)
    ntok = F.coalesce(token_count_expr(c), F.lit(0))
    nchar = F.greatest(F.coalesce(F.length(c).cast("long"), F.lit(0)), F.lit(1))
    npr = F.coalesce(
        (F.length(c) - F.length(F.regexp_replace(c, NON_PRINTABLE_ASCII, "")))
        .cast("long"),
        F.lit(0),
    )
    qbp = F.coalesce(quality_bp_expr(c), F.lit(0))

    out = df.select(
        F.col(id_col),
        ntok.alias("_ntok"),
        nchar.alias("_nc"),
        npr.alias("_npr"),
        qbp.alias("_qbp"),
    )
    if min_avg_ll is not None:
        ll = bigram_logprob(df, text_col, id_col, alpha=lm_alpha).select(
            id_col, "avg_ll"
        )
        out = out.join(ll, id_col, "left")

    reason = (
        F.when(F.col("_ntok") < min_tokens, "too_short")
        .when(F.col("_ntok") > max_tokens, "too_long")
        .when(
            F.col("_npr") * 10000 > F.lit(max_nonprintable_bp) * F.col("_nc"),
            "encoding",
        )
        .when(F.col("_qbp") < min_quality_bp, "low_quality")
    )
    if min_avg_ll is not None:
        reason = reason.when(
            F.col("avg_ll").isNull() | (F.col("avg_ll") < min_avg_ll), "low_lm"
        )
    reason = reason.otherwise("")
    return out.select(
        id_col,
        (reason == "").alias("keep"),
        reason.alias("reason"),
    )
