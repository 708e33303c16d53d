"""Corpus composition diagnostics over n-gram sets.

`novelty_frac`: for each document (in id order), how many of its
distinct token k-grams appear here FIRST vs. already occurred in a
lower-id document — the novelty/memorization signal a dedup'd corpus
is tuned on (a near-zero-novelty doc is boilerplate even if no single
earlier doc matches it wholesale, which is exactly the case pairwise
near-dup misses).

`source_overlap`: pairwise Jaccard of distinct k-gram sets between
sources — the "how much do my crawl snapshots / dumps overlap"
matrix that decides whether cross-source dedup is worth its shuffle.

Scale shape:
- gram tables are (key, small-int) rows; first-occurrence and
  per-source-distinct are map-side-combinable aggregates on the gram
  key — the same bounded-by-observed-vocabulary budget as tfidf's df
  table, with the same salting guidance if gram frequency skews;
- novelty joins the compact first-occurrence table back on the gram
  key (shuffle bounded by distinct-gram volume, not corpus volume);
- source_overlap's pair join is on the gram key with s1 < s2 — output
  is |sources|^2 rows, the gram-key join is Σ|gram-bucket|^2 bounded
  by per-gram source cardinality (<= |sources|, a constant).

Counts are returned as integers (no ratio column) so the result is
bit-portable across engines; callers derive ratios at display time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _doc_grams(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    # POSTING-COMPRESSED grams (round-13 migration): every downstream
    # consumer shuffles and joins on the gram key, so 60-bit md5-prefix
    # ints move instead of ~20-byte strings (hashed_shingles_expr's
    # rationale — the oracle hashes identically, exact by construction
    # even under a collision, which both engines merge the same way)
    from webloghunter_spark.pipelines.dedup import hashed_shingles_expr

    return df.select(
        F.col(id_col),
        F.explode(hashed_shingles_expr(text_col, k)).alias("_g"),
    )


def novelty_frac(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(id, n_grams, n_novel): distinct k-grams in the doc, and how many
    of them first occur at this id (min-id over the corpus). Documents
    with < k tokens return (0, 0).

    Gram identity is a 60-bit md5-prefix key (hashed_shingles_expr),
    not the string n-gram: beyond ~2^30 distinct grams, birthday
    collisions will merge a few gram classes and perturb the counts
    relative to true string-shingle semantics (~10^5 merged classes at
    10^12 grams — per-doc effect negligible, but not zero). Engine/
    oracle parity is unaffected: both hash identically."""
    grams = _doc_grams(df, text_col, id_col, k)
    first = grams.groupBy("_g").agg(F.min(id_col).alias("_first"))
    per_doc = (
        grams.join(first, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("_first") == F.col(id_col), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
) -> DataFrame:
    """(src_a, src_b, n_a, n_b, n_common) for every source pair with
    src_a < src_b: distinct-gram set sizes and intersection size.
    Jaccard = n_common / (n_a + n_b - n_common), left to the caller.

    Set sizes count 60-bit hashed gram keys (hashed_shingles_expr):
    past ~2^30 distinct grams per source, birthday collisions shave a
    vanishing fraction off n_a/n_b/n_common vs string-gram semantics.
    Both engines hash identically, so parity holds regardless."""
    from webloghunter_spark.pipelines.dedup import hashed_shingles_expr

    # hashed gram key (see _doc_grams): the distinct, the sizes
    # aggregate and the pair self-join all move 8-byte ints
    sg = (
        df.select(
            F.col(source_col).alias("_src"),
            F.explode(hashed_shingles_expr(text_col, k)).alias("_g"),
        )
        .distinct()
    )
    sizes = sg.groupBy("_src").agg(F.count(F.lit(1)).alias("_n"))
    a = sg.select(F.col("_src").alias("src_a"), "_g")
    b = sg.select(F.col("_src").alias("src_b"), "_g")
    common = (
        a.join(b, "_g")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("_src").alias("src_a"), F.col("_n").alias("n_a"))
    nb = sizes.select(F.col("_src").alias("src_b"), F.col("_n").alias("n_b"))
    pairs = (
        na.crossJoin(nb)
        .filter(F.col("src_a") < F.col("src_b"))
        .join(common, ["src_a", "src_b"], "left")
        .select(
            "src_a", "src_b", "n_a", "n_b",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        )
    )
    return pairs
