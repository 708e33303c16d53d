"""Round-4 corpus ops: decontamination, semantic dedup, URL canon."""

import pytest
from pyspark.sql import functions as F

from webloghunter_spark.functions.url import canonical_uri_expr, host_expr
from webloghunter_spark.pipelines.decontam import (
    contaminated_docs,
    decontaminate,
    eval_shingle_set,
)
from webloghunter_spark.pipelines.semdedup import (
    semantic_dedup,
    semantic_dup_flags,
)


# ---------------------------------------------------------------- decontam

TRAIN = [
    (0, "alpha beta gamma delta epsilon zeta"),        # contains eval 4-gram
    (1, "one two three four five six seven"),          # clean
    (2, "alpha beta gamma delta something else"),      # same eval 4-gram
    (3, "tiny doc"),                                   # < n tokens
]
EVAL = [
    (100, "prefix alpha beta gamma delta suffix"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_eval_shingle_set_distinct(spark):
    grams = {r._gram for r in eval_shingle_set(_df(spark, EVAL), n=4).collect()}
    assert "alpha beta gamma delta" in grams
    assert len(grams) == 3  # 6 tokens -> 3 4-grams, all distinct


def test_contaminated_docs_flags_overlap(spark):
    hits = {
        r.doc_id: r.n_hits
        for r in contaminated_docs(
            _df(spark, TRAIN), _df(spark, EVAL), n=4
        ).collect()
    }
    assert hits == {0: 1, 2: 1}


def test_decontaminate_removes_only_contaminated(spark):
    kept = {
        r.doc_id
        for r in decontaminate(_df(spark, TRAIN), _df(spark, EVAL), n=4).collect()
    }
    assert kept == {1, 3}


def test_decontaminate_shuffle_fallback_matches_broadcast(spark):
    a = contaminated_docs(
        _df(spark, TRAIN), _df(spark, EVAL), n=4, broadcast_eval=True
    ).collect()
    b = contaminated_docs(
        _df(spark, TRAIN), _df(spark, EVAL), n=4, broadcast_eval=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------- semdedup


def _emb(spark):
    # Two well-separated directions; ids 0 and 1 are the centroids.
    # 2 ~ 0 (exact dup direction), 3 ~ 1 (near dup), 4 orthogonal-ish
    # to 1 but assigned to it, 5 ~ 0 again (dup of 0 AND of 2).
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.2]),
        (4, [0.0, 0.4, 1.0]),
        (5, [1.0, 0.1, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dup_flags(spark):
    out = {
        r.vec_id: (r.cent_id, r.max_sim, r.is_dup)
        for r in semantic_dup_flags(_emb(spark), n_centroids=2, tau=0.9).collect()
    }
    assert out[0][0] == 0 and out[2][0] == 0 and out[5][0] == 0
    assert out[1][0] == 1 and out[3][0] == 1 and out[4][0] == 1
    # lowest id per cluster has no lower-id member
    assert out[0][1] is None and not out[0][2]
    assert out[1][1] is None and not out[1][2]
    # exact-direction dup
    assert out[2][1] == 1.0 and out[2][2]
    assert out[5][2]                      # cos(0,5) ~ .995 >= .9
    assert out[3][2]                      # cos(1,3) ~ .98
    assert not out[4][2]                  # cos to 1/3 well below .9


def test_semantic_dedup_keeps_representatives(spark):
    kept = {r.vec_id for r in semantic_dedup(_emb(spark), n_centroids=2, tau=0.9).collect()}
    assert kept == {0, 1, 4}


def test_semantic_dup_flags_fast_matches_expr(spark):
    from webloghunter_spark.pipelines.semdedup import semantic_dup_flags_fast

    expr = semantic_dup_flags(_emb(spark), n_centroids=2, tau=0.9).collect()
    fast = semantic_dup_flags_fast(_emb(spark), n_centroids=2, tau=0.9).collect()
    key = lambda r: (r.vec_id, r.cent_id, r.max_sim, r.is_dup)
    assert sorted(map(key, expr)) == sorted(map(key, fast))


def test_semantic_dedup_arrow_path(spark):
    kept = {
        r.vec_id
        for r in semantic_dedup(
            _emb(spark), n_centroids=2, tau=0.9, use_arrow=True
        ).collect()
    }
    assert kept == {0, 1, 4}


def test_semantic_dedup_explicit_centroids(spark):
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0, 0.0]), (9, [0.0, 1.0, 0.0])],
        "cent_id long, centroid array<double>",
    )
    out = {
        r.vec_id: r.cent_id
        for r in semantic_dup_flags(_emb(spark), centroids=cents).collect()
    }
    assert out[0] == 7 and out[1] == 9


# ---------------------------------------------------------------- url


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("/Index.HTML?q=1&x=2", "/index.html"),
        ("/a//b///c/", "/a/b/c"),
        ("/path/", "/path"),
        ("/", "/"),
        ("/a#frag", "/a"),
        ("/a?x=/b/", "/a"),
    ],
)
def test_canonical_uri(spark, raw, canon):
    got = (
        spark.createDataFrame([(raw,)], "u string")
        .select(canonical_uri_expr("u").alias("c"))
        .collect()[0][0]
    )
    assert got == canon


def test_host_expr(spark):
    rows = [("https://example.com/x",), ("http://a.b:8080/",), ("-",)]
    got = [
        r[0]
        for r in spark.createDataFrame(rows, "u string")
        .select(host_expr("u"))
        .collect()
    ]
    assert got == ["example.com", "a.b:8080", ""]
