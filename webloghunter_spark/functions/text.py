"""Text-analysis functions for large-scale document pipelines.

All of these are pure Column expressions (JVM-side, codegen'd) so they
run at full scan speed over 100 TB of documents — no Python per row.
Formulas are deliberately simple closed forms so an external SQL oracle
can replicate them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Punctuation class shared with the SQL oracle (keep in sync).
PUNCT_CLASS = r"""[.,;:!?'"()\[\]{}-]"""

STOPWORDS = ("the", "a", "an", "of", "to", "in", "and", "is", "on", "for")

# Disjoint marker-token sets per language for the n-gram/stopword
# language-ID heuristic. Ties resolve in declaration order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "les", "et", "une", "est"),
}


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_expr(col: Column | str) -> Column:
    return F.size(tokens_expr(col)).cast("long")


def punct_count_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))).cast("long")


def stopword_count_expr(col: Column | str) -> Column:
    toks = tokens_expr(col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t)))).cast("long")


def quality_score_raw_expr(col: Column | str) -> Column:
    """Heuristic quality in [0, 1] (unrounded):
    0.5 * min(tokens/100, 1)  — enough content
    + 0.3 * (1 - punct_ratio) — not punctuation soup
    + 0.2 * min(5*stop_ratio, 1) — natural-language function words
    """
    c = F.col(col) if isinstance(col, str) else col
    ntok = token_count_expr(c).cast("double")
    nchar = F.greatest(F.length(c).cast("double"), F.lit(1.0))
    punct_ratio = punct_count_expr(c).cast("double") / nchar
    stop_ratio = stopword_count_expr(c).cast("double") / F.greatest(ntok, F.lit(1.0))
    return (
        F.least(ntok / 100.0, F.lit(1.0)) * 0.5
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
    )


def quality_score_expr(col: Column | str) -> Column:
    return F.round(quality_score_raw_expr(col), 4)


def quality_bp_expr(col: Column | str) -> Column:
    """Quality in integer basis points (0-10000). floor(x*1e4 + 0.5)
    over identical IEEE doubles is engine-portable, unlike decimal
    rounding of a double that can sit on a .xxxx5 boundary."""
    return F.floor(quality_score_raw_expr(col) * 10000.0 + 0.5).cast("long")


def lang_id_expr(col: Column | str) -> Column:
    """Marker-token argmax language guess; 'und' (undetermined) if no
    marker hits. Ties resolve in LANG_MARKERS declaration order."""
    toks = F.transform(tokens_expr(col), lambda t: F.lower(t))
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    langs = list(LANG_MARKERS)
    expr = None
    for i, lang in enumerate(langs):
        cond = counts[lang] > 0
        for other in langs[:i]:
            cond = cond & (counts[lang] > counts[other])
        for other in langs[i + 1 :]:
            cond = cond & (counts[lang] >= counts[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise(F.lit("und"))


def fingerprint_expr(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the lowercased,
    whitespace-collapsed text (the exact-dedup key)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(norm)


def shingles_expr(col: Column | str, k: int = 3) -> Column:
    """Token k-gram shingles (space-joined), [] when fewer than k tokens.

    Built by zipping k shifted copies of the token array (k slices
    total) rather than slicing per position (n slices) — higher-order
    functions are interpreted, so per-element slicing is ~10x slower.
    """
    toks = tokens_expr(col)
    n = F.size(toks)
    m = n - F.lit(k - 1)
    shifted = [F.slice(toks, F.lit(i + 1), m) for i in range(k)]
    zipped = F.arrays_zip(*shifted)
    joined = F.transform(
        zipped, lambda z: F.concat_ws(" ", *[z[str(i)] for i in range(k)])
    )
    return F.when(n < k, F.array().cast("array<string>")).otherwise(joined)
