"""Corpus-trained n-gram language-model scoring — the perplexity
quality filter of web-corpus pipelines (CCNet / Gopher / RefinedWeb
filter on LM perplexity; here the LM is a self-trained add-alpha
token-bigram model so the whole computation stays inside the engine
and an external SQL oracle reproduces it bit-for-bit).

Model: P(w2 | w1) = (C(w1 w2) + alpha) / (C(w1 ·) + alpha * V), with
C counted over the corpus's bigram occurrences and V the corpus
unigram vocabulary size. A document's score is the mean natural-log
likelihood of its bigrams; low scores mark gibberish / boilerplate /
wrong-language text relative to the corpus distribution.

Scale shape (100 TB corpus):
- bigram extraction is a narrow projection + explode (no shuffle);
- the count tables aggregate map-side-combinable on compact keys
  ((w1, w2) strings); their size is bounded by OBSERVED n-gram
  vocabulary, not corpus size;
- scoring joins each doc's bigram rows to the count tables — shuffle
  joins on (w1, w2) and (w1). Hot bigrams ("of the") skew exactly like
  TF-IDF's stopword df join; the same salting pattern applies
  (replicate the count row S ways, salt the probe side — see
  functions/text.tfidf_topk salt_partitions) if AQE's skew handling
  is not enough;
- the vocabulary size V is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webloghunter_spark.functions.text import tokens_expr
from webloghunter_spark.session import materialize


def _bigram_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) per consecutive lowercased token pair; docs with
    fewer than 2 tokens contribute no rows.

    Built as arrays_zip of two slices rather than a transform-over-
    indices HOF: slice/arrays_zip stay inside whole-stage codegen while
    transform+element_at is interpreted per element — at a 32x corpus
    the HOF form was the profile's hot spot."""
    toks = F.lower(F.concat_ws(" ", tokens_expr(text_col)))
    t = F.split(toks, " ")  # re-split the lowercased join: one lower() call
    n = F.size(t)
    pairs = F.when(
        n >= 2,
        F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1)),
    )
    return (
        df.select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(id_col, F.col("_p.0").alias("w1"), F.col("_p.1").alias("w2"))
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    round_digits: int = 4,
) -> DataFrame:
    """(id, n_bigrams, avg_ll): mean ln-likelihood of each document's
    token bigrams under the corpus's own add-alpha bigram model.
    Documents with < 2 tokens return n_bigrams=0, avg_ll NULL."""
    # The bigram table feeds THREE consumers (cb, cu, the probe side);
    # without materialization the interpreted-HOF extraction re-runs per
    # consumer and the query goes superlinear at scale (13x wall at a
    # 32x corpus, vs ~2x once cached — SCALING.md round 4).
    bi = materialize(_bigram_rows(df, text_col, id_col))
    cb = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    cu = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("_cu"))
    vocab = (
        df.select(
            F.explode(
                F.transform(tokens_expr(text_col), lambda t: F.lower(t))
            ).alias("_tok")
        )
        .agg(F.count_distinct("_tok").alias("_v"))
    )
    a = F.lit(float(alpha))
    scored = (
        bi.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log((F.col("_cb") + a) / (F.col("_cu") + a * F.col("_v"))).alias("_lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_lp"), round_digits).alias("avg_ll"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("avg_ll"),
        )
    )
