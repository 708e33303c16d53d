"""Trained quality classifier — the discriminative sibling of DSIR.

Real curation pipelines (CCNet, LLaMA/RedPajama-style) train a small
linear classifier on "looks like the target corpus" vs "random crawl"
labels and keep the high-probability documents. This module trains a
logistic regression over hashed token-bucket features with FULL-BATCH
gradient descent, engineered so an external SQL engine can replay
training bit-for-bit (the kmeans discipline — quantized per-round
state):

- features: x_b = (tokens of the doc hashing to bucket b) / ntok over
  a B-cell md5 bucket space (the dsir/dist_drift feature family) —
  one combinable aggregate, |docs| x <=B sparse rows;
- each GD round is two bounded shuffles: join features with the
  broadcast B-row weight table, per-doc logit (per-(doc,b) products
  quantized to the 1e-9 grid before the integer sum — aggregation-
  order-free), sigmoid residual (quantized to 1e-9), then the
  per-bucket MEAN-gradient aggregate (products quantized again);
- weights live in integer MICRO units and update as
  w += floor(lr * g * 1e6 + 0.5) — identical double arithmetic in
  Spark, Python (driver loop) and the DuckDB oracle, so 3 unrolled
  CTE iterations reproduce the exact weight vector.

Scale: per round the corpus is touched twice (logit pass + gradient
pass) over the MATERIALIZED feature table; driver state is B weights.
B and iters are constants — at 100 TB this is a handful of combinable
aggregates, no single-machine stage anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webloghunter_spark.functions.text import hash_bucket_expr, tokens_expr

CLS_BUCKETS = 128
CLS_LR = 100.0
CLS_ITERS = 3


def doc_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = CLS_BUCKETS,
) -> DataFrame:
    """(id, b, x) sparse normalized bucket frequencies; empty docs
    contribute no rows (their logit is the bias-free 0 -> prob 0.5)."""
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("_t")
    ).select(id_col, hash_bucket_expr("_t", n_buckets).alias("b"))
    cnt = tok.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("_c"))
    # per-doc token total = sum of this doc's bucket counts — a window
    # over the |docs| x <=B aggregate instead of a SECOND token-scale
    # explode+groupBy and an id join (guide §2.3/§2.4: the historical
    # form re-ran the tokenize+explode for `tot` and shuffled token
    # volume twice; same _n by construction, identical double division)
    w = Window.partitionBy(id_col)
    return cnt.select(
        id_col,
        "b",
        (F.col("_c").cast("double") / F.sum("_c").over(w)).alias("x"),
    )


def _logits(feat: DataFrame, wdf: DataFrame, id_col: str) -> DataFrame:
    """(id, z) with z from nano-quantized per-(doc,b) products —
    integer sum, so aggregation order can't move a boundary."""
    term = F.floor(
        F.col("x") * (F.col("w_micro") / F.lit(1e6)) * 1e9 + F.lit(0.5)
    ).cast("long")
    return (
        feat.join(F.broadcast(wdf), "b")
        .select(F.col(id_col), term.alias("_t"))
        .groupBy(id_col)
        .agg((F.sum("_t").cast("double") / F.lit(1e9)).alias("z"))
    )


def train_quality_classifier(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = CLS_BUCKETS,
    iters: int = CLS_ITERS,
    lr: float = CLS_LR,
    return_features: bool = False,
) -> list[tuple[int, int]] | tuple[list[tuple[int, int]], DataFrame]:
    """Full-batch logistic regression, returns [(bucket, w_micro)].

    Ids must be unique across target ∪ raw. Weights start at 0 and
    every round's update is quantized to integer micro units, so the
    returned vector is a pure function of the corpora — any engine
    replaying the same arithmetic gets the identical ints.

    `return_features=True` additionally returns the MATERIALIZED
    (id, b, x) feature frame the rounds trained on, so a caller about
    to score the same corpus (the train-then-score composition) can
    pass it to quality_classifier_scores instead of paying the
    tokenize+explode+two-aggregate feature pass a second time. The
    frame stays registered with the materialize() lifecycle — the
    caller's release_materialized() frees it as usual."""
    from webloghunter_spark.session import materialize

    if iters <= 0 or n_buckets <= 0:
        raise ValueError(
            f"need iters > 0 and n_buckets > 0, got iters={iters}, "
            f"n_buckets={n_buckets}"
        )
    spark = target.sparkSession
    lab = target.select(
        F.col(id_col), F.lit(1.0).alias("y")
    ).unionByName(raw.select(F.col(id_col), F.lit(0.0).alias("y")))
    docs = target.select(id_col, text_col).unionByName(
        raw.select(id_col, text_col)
    )
    feat = materialize(
        doc_features(docs, text_col, id_col, n_buckets)
    )
    # lab is re-probed every GD round — materialize the tiny (id, y)
    # frame so rounds never rescan the input corpora's lineage
    lab = materialize(lab)
    n_total = lab.count()
    w = {b: 0 for b in range(n_buckets)}
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(b, wm) for b, wm in sorted(w.items())], "b long, w_micro long"
        )
        z = _logits(feat, wdf, id_col)
        # residual r = y - sigmoid(z), quantized to nano before the
        # gradient products so the bucket sums are order-free ints
        r = (
            lab.join(z, id_col, "left")
            .select(
                F.col(id_col),
                F.floor(
                    (
                        F.col("y")
                        - F.lit(1.0)
                        / (
                            F.lit(1.0)
                            + F.exp(-F.coalesce(F.col("z"), F.lit(0.0)))
                        )
                    )
                    * 1e9
                    + F.lit(0.5)
                ).cast("long").alias("rn"),
            )
        )
        g = (
            feat.join(r, id_col)
            .select(
                "b",
                F.floor(
                    (F.col("rn") / F.lit(1e9)) * F.col("x") * 1e9
                    + F.lit(0.5)
                ).cast("long").alias("gn"),
            )
            .groupBy("b")
            .agg(F.sum("gn").alias("gn"))
            .collect()
        )
        gr = {int(row["b"]): int(row["gn"]) for row in g}
        for b in range(n_buckets):
            gmean = gr.get(b, 0) / (1e9 * n_total)
            w[b] = w[b] + int(math.floor(lr * gmean * 1e6 + 0.5))
    if return_features:
        return sorted(w.items()), feat
    return sorted(w.items())


def quality_classifier_scores(
    df: DataFrame,
    weights: list[tuple[int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = CLS_BUCKETS,
    features: DataFrame | None = None,
) -> DataFrame:
    """(id, ntok, logit_micro, prob_bp) for every document under a
    trained weight vector — one feature aggregate + one broadcast
    join; docs with no tokens score logit 0 / prob 5000 bp.

    `features` (optional): a precomputed (id, b, x) frame covering
    exactly `df`'s documents — pass train_quality_classifier's
    return_features frame when scoring the corpus it trained on, so
    the feature pass runs once for the whole train-then-score
    composition instead of once per phase. doc_features is a pure
    function of the (id, text) row SET, so any frame built from the
    same documents (in any order / partitioning) yields identical
    scores.

    WARNING — no validation is performed on `features`: a stale or
    partial frame (built from a different snapshot, or missing some
    of df's ids) SILENTLY scores the missing documents as logit 0 /
    prob 5000 bp (the left join yields NULL z, coalesced to 0). Only
    pass a frame you know covers df's rows exactly; when in doubt,
    pass features=None and let the pass recompute."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(int(b), int(wm)) for b, wm in weights], "b long, w_micro long"
    )
    feat = (
        features
        if features is not None
        else doc_features(df, text_col, id_col, n_buckets)
    )
    z = _logits(feat, wdf, id_col)
    ntok = F.size(tokens_expr(text_col)).cast("long")
    zc = F.coalesce(F.col("z"), F.lit(0.0))
    return (
        df.select(F.col(id_col), ntok.alias("ntok"))
        .join(z, id_col, "left")
        .select(
            id_col,
            "ntok",
            F.floor(zc * 1e6 + F.lit(0.5)).cast("long").alias("logit_micro"),
            F.floor(
                F.lit(10000.0) / (F.lit(1.0) + F.exp(-zc)) + F.lit(0.5)
            ).cast("long").alias("prob_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Lexicon topic classifier — the zero-training sibling of the trained
# quality classifier above. Real pipelines bucket the crawl into
# domains (news / code / forums / reference ...) with keyword lexicons
# before any learned router exists (WebOrganizer-style taxonomies boot
# from exactly this), and the resulting topic column feeds the mix
# operators (domain_mix / mix_temperature) as the grouping key.
#
# Scale: the whole classification is ONE pure-codegen projection —
# per-topic marker counts via array intersection on the token array,
# argmax by CASE chain. No shuffle, no UDF, no state: at 100 TB this
# runs at scan speed inside whatever stage already reads the text.

#: Default topic lexicons over the synthetic corpus vocabulary.
#: Ties resolve in declaration order (the lang_id_expr discipline);
#: every SQL oracle mirrors the declaration order in its CASE chain.
DEFAULT_TOPICS: dict[str, tuple[str, ...]] = {
    "query": ("query", "join", "filter", "scan", "agg", "group"),
    "storage": ("table", "row", "column", "part", "batch", "hash"),
    "streaming": ("stream", "window", "order", "sort", "line"),
    "perf": ("fast", "slow", "big", "small", "merge"),
}


def topic_classify(
    df: DataFrame,
    lexicons: dict[str, tuple[str, ...]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tag every document with its dominant lexicon topic.

    Returns (id, topic, topic_hits, total_hits, confidence_bp):
    topic = the lexicon with the most marker-token hits ('none' when
    no lexicon hits at all), ties resolving in declaration order;
    confidence_bp = topic_hits / total_hits in basis points
    (round-half-up, exact integer arithmetic — no float division).

    Counterpart of the reference's rule-tagging surface (risk.py /
    triage rules assign categories from token evidence) re-expressed
    for corpus curation. Pure whole-stage-codegen expressions.
    """
    lex = DEFAULT_TOPICS if lexicons is None else lexicons
    if not lex:
        raise ValueError("lexicons must be non-empty")
    toks = F.transform(tokens_expr(text_col), lambda t: F.lower(t))
    counts: dict[str, F.Column] = {}
    for topic, markers in lex.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[topic] = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, t))
        ).cast("long")
    topics = list(lex)
    pick = None
    for i, topic in enumerate(topics):
        cond = counts[topic] > 0
        for other in topics[:i]:
            cond = cond & (counts[topic] > counts[other])
        for other in topics[i + 1:]:
            cond = cond & (counts[topic] >= counts[other])
        pick = F.when(cond, topic) if pick is None else pick.when(cond, topic)
    pick = pick.otherwise(F.lit("none"))
    best = F.greatest(*counts.values()) if len(counts) > 1 else next(
        iter(counts.values())
    )
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        pick.alias("topic"),
        best.alias("topic_hits"),
        total.alias("total_hits"),
        F.when(
            total > 0,
            (best * 20000 + total) / (total * 2),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("confidence_bp"),
    )
