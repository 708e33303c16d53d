"""Deterministic fixed-iteration Lloyd's k-means on DataFrames.

`pyspark.ml`'s KMeans (functions/similarity.kmeans_centroids) is the
production trainer, but its k-means|| init is seeded-random and its
update order is nondeterministic — useless for an exact cross-engine
oracle. This module is the oracle-checkable trainer the SemDeDup / IVF
operators can feed on: seeds are the k lowest-id vectors, every
iteration's centroid means are rounded to a fixed grid (so the
iteration STATE is quantized and two engines cannot drift), ties in
the argmin break to the lowest cent_id, and the iteration count is a
parameter, not a convergence test.

100 TB design per iteration:
- ASSIGN: one `mapInPandas` pass; the k x dim centroid matrix (a few
  KB) rides the task closure and each Arrow batch scores all
  centroids with a single (batch x dim) @ (dim x k) matmul — no
  shuffle, no HOF folds, no k-way crossJoin.
- UPDATE: `posexplode` + groupBy(cent_id, pos) avg. The explode is
  n x dim rows but avg is combinable, so map-side partial aggregation
  collapses each partition to <= k x dim cells before the exchange —
  the shuffle moves O(k x dim x partitions) rows, not O(n x dim).
- The k x dim new-centroid table is collected per round (same k-row
  driver-artifact convention as ivf_assign_fast / semdedup). Lineage
  grows by two narrow stages per iteration; for iters beyond ~10,
  re-seed via localCheckpoint like pipelines/dedup.near_dedup_cc.

Empty clusters simply drop out of the mean aggregate (both engines),
so k can only shrink, never resurrect — matching the SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from webloghunter_spark.functions.numeric import round_half_up

Centroids = "list[tuple[int, list[float]]]"


def _collect_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> list[tuple[int, list[float]]]:
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    return [
        (i, [float(x) for x in r[1]]) for i, r in enumerate(rows)
    ]


def kmeans_assign(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """One assignment pass against a fixed (cent_id, vector) list:
    (id, cent_id, dist) with dist the rounded squared L2. Shuffle-free
    — the centroid matrix ships in the task closure and each Arrow
    batch is one matmul. Ties argmin to the lowest cent_id."""
    import numpy as np
    import pandas as pd

    cent_rows = sorted(cents, key=lambda c: c[0])
    cids = np.array([c[0] for c in cent_rows], dtype=np.int64)
    cmat = np.stack(
        [np.asarray(c[1], dtype=np.float64) for c in cent_rows]
    )
    c2 = (cmat * cmat).sum(axis=1)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # rows sorted by cent_id => argmin's first-min IS the
            # lowest cent_id on exact ties
            d = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ cmat.T) + c2
            j = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cent_id": cids[j],
                    "dist": round_half_up(
                        d[np.arange(len(j)), j], round_digits
                    ),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, cent_id long, dist double"
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> list[tuple[int, list[float]]]:
    """Train centroids: seed from the k lowest ids, run iters-1
    (assign → quantized-mean update) rounds, return the (cent_id,
    vector) list the iters-th assignment pass would use. Centroid
    means are rounded to `round_digits` each round so the iteration
    state is identical across engines."""
    cents = _collect_centroids(df, id_col, vec_col, k)
    for _ in range(max(iters, 1) - 1):
        assigned = kmeans_assign(df, cents, id_col, vec_col, round_digits)
        # Mean over INTEGER micro-units, not a raw float avg: float
        # summation order differs across engines/partitions, so an avg
        # landing within ~1e-13 of a 1e-6 rounding boundary could flip
        # centroid state between Spark and the SQL oracle (the exact
        # failure kmeans_cluster_sizes hit on real data). Integer sums
        # are order-free; the single division + round is bit-identical
        # anywhere. Quantizing inputs to the 1e-6 grid first is part of
        # the deterministic-trainer contract, like the per-round
        # centroid rounding.
        grid = 10.0 ** round_digits
        # stored-value half-away-from-zero grid, not F.round: F.round
        # is HALF_UP on the double's shortest decimal repr and can
        # diverge from DuckDB round() on grid-line doubles
        mc = F.col("val") * grid
        micro = (F.signum(mc) * F.floor(F.abs(mc) + F.lit(0.5))).cast(
            "long"
        )
        mean = F.sum(micro) / F.count(F.lit(1)) / grid
        means = (
            assigned.join(df.select(id_col, vec_col), id_col)
            .select("cent_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(
                (
                    F.signum(mean)
                    * F.floor(F.abs(mean) * grid + F.lit(0.5))
                    / grid
                ).alias("val")
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(int(r["cent_id"]), {})[int(r["pos"])] = float(
                r["val"]
            )
        cents = [
            (cid, [vals[p] for p in sorted(vals)])
            for cid, vals in sorted(by_cid.items())
        ]
    return cents


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Run `iters` assignment passes with a centroid update between
    each; return (id, cent_id, dist) — the final assignment and its
    SQUARED L2 distance, rounded to `round_digits`.

    Distances use the expanded |e|^2 - 2 e.c + |c|^2 form in both the
    Arrow kernel and the SQL oracle so the float rounding surface
    matches; centroid means are rounded to `round_digits` each round,
    making the per-round state identical across engines (a raw-mean
    iteration would let 1e-13 summation-order noise compound into
    assignment flips)."""
    cents = kmeans_fit(df, k, iters, id_col, vec_col, round_digits)
    return kmeans_assign(df, cents, id_col, vec_col, round_digits)


def knn_ivf_trained(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF search over a LLOYD-TRAINED index, end-to-end in one call:
    fit centroids (kmeans_fit), build the inverted lists (the final
    assignment), pick the n_probe centroids nearest the query by the
    SAME squared-L2 metric the index was trained with, and return the
    top-k nearest corpus vectors among the probed lists as
    (id, cent_id, dist).

    This is functions/similarity.cosine_topk_ivf with the
    stand-in-lowest-id centroids replaced by trained ones and a
    metric-consistent L2 probe (training by L2 then probing by cosine
    degrades recall for no reason). Probe selection is a k-row driver
    computation; assignment and query scoring run in ONE kernel pass
    (no join, no shuffle) and the top-k is orderBy+limit
    (TakeOrderedAndProject — never a global sort). At scale the
    assignment is written once as the partitioned index
    (sources/store.write_ivf_index) and only the probe+scan runs per
    query."""
    import numpy as np
    import pandas as pd

    cents = kmeans_fit(df, n_centroids, iters, id_col, vec_col, round_digits)
    cent_rows = sorted(cents, key=lambda c: c[0])
    cids = np.array([c[0] for c in cent_rows], dtype=np.int64)
    cmat = np.stack(
        [np.asarray(c[1], dtype=np.float64) for c in cent_rows]
    )
    c2 = (cmat * cmat).sum(axis=1)
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    q2 = float(q @ q)
    probe_order = []
    for cid, cv in cent_rows:
        cv = np.asarray(cv, dtype=np.float64)
        probe_order.append(
            (float((cv * cv).sum() - 2.0 * (cv @ q) + q2), cid)
        )
    probe_order.sort()
    probe_ids = {cid for _, cid in probe_order[:n_probe]}

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v2 = (v * v).sum(axis=1)
            d = v2[:, None] - 2.0 * (v @ cmat.T) + c2
            j = d.argmin(axis=1)
            dq = round_half_up(v2 - 2.0 * (v @ q) + q2, round_digits)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cent_id": cids[j],
                    "dist": dq,
                }
            )
            yield out[out["cent_id"].isin(probe_ids)]

    return (
        df.select(id_col, vec_col)
        .mapInPandas(gen, f"{id_col} long, cent_id long, dist double")
        .orderBy("dist", id_col)
        .limit(k)
    )


def kmeans_cluster_sizes(
    assigned: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(cent_id, n, mean_dist) summary of a kmeans_lloyd output — the
    inertia-per-cluster diagnostic; one combinable aggregate.

    `dist` sits on a 1e-6 grid (kmeans_lloyd rounds it), so the mean
    is computed over exact integer micro-units: a float sum's order
    dependence put the raw avg within 1e-13 of a rounding boundary on
    real data, flipping the last digit between engines. Integer sums
    are order-free, so the division result is bit-identical anywhere."""
    # stored-value half-up grid, not F.round (dist >= 0 so signum is
    # omitted on the micro cast; the mean keeps it for uniformity)
    micro = F.floor(F.col("dist") * 1e6 + F.lit(0.5)).cast("long")
    mean = F.sum(micro) / F.count(F.lit(1)) / 1e6
    return (
        assigned.groupBy("cent_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(mean * 1e6 + F.lit(0.5)) / 1e6).alias("mean_dist"),
        )
    )


def cluster_label_purity(
    assigned: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Cluster-vs-label contingency audit of a kmeans_lloyd output:
    per cluster, the member count, distinct-label count, majority
    label (ties to the smallest label) and its share in basis points
    — the "did unsupervised structure recover the annotation" check
    that prices centroid-based curation (SemDeDup buckets, IVF lists)
    against known labels. NULL-labeled rows are excluded.

    One hash join of the assignment against the label column and two
    group-scale aggregates (per (cluster, label), then per cluster) —
    k x |labels| rows after the first; nothing vector-scale moves."""
    lab = labels.filter(F.col(label_col).isNotNull()).select(
        id_col, F.col(label_col).cast("long").alias("_lab")
    )
    counts = (
        assigned.select(id_col, "cent_id")
        .join(lab, id_col)
        .groupBy("cent_id", "_lab")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    tot = counts.groupBy("cent_id").agg(
        F.sum("_n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
    )
    w = W.partitionBy("cent_id").orderBy(F.col("_n").desc(), F.col("_lab"))
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cent_id",
            F.col("_lab").alias("top_label"),
            F.col("_n").alias("top_n"),
        )
    )
    return tot.join(top, "cent_id").select(
        "cent_id", "n_total", "n_labels", "top_label", "top_n",
        F.floor(F.col("top_n") * 10000.0 / F.col("n_total") + F.lit(0.5))
        .cast("long")
        .alias("purity_bp"),
    )
