"""One entry point from raw documents to a loader-ready training
dataset on disk — the composition a user of this engine actually
runs:

    curate (gate -> dedup tiers -> decontam [-> budget])
      -> temperature-mix repetition plan (upsample_epochs)
      -> seeded multi-epoch order (epoch_order)
      -> partitioned parquet shards whose ROW ORDER is the training
         order, plus an order-pinning verification manifest.

Every stage is an already-oracled operator (curate_pipeline,
upsample_epochs, epoch_order, train_manifest's digest discipline);
this module only wires them and lands the files, so correctness rests
on the per-stage gates and the round-trip test, not on a new oracle.

Scale shape: the funnel's own stages dominate (see curate_corpus);
the writer adds upsample's broadcast plan join and ONE exchange
(epoch_order's (epoch, shard) window — the same exchange the
dynamic-partition writer needs anyway, since input clustered by the
partition columns is written through without re-sorting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_training_dataset(
    docs: DataFrame,
    path: str,
    eval_df: DataFrame | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality_bp: int | None = 5000,
    near_dedup_threshold: float | None = 0.8,
    alpha: float = 0.7,
    max_epochs: int = 4,
    n_shards: int = 8,
    seed: str = "train",
    token_budget: int | None = None,
) -> dict:
    """Curate `docs`, realize the temperature mix as a multi-epoch
    order, and land `epoch=E/shard_id=K/` parquet partitions whose
    row order IS the training order. Returns a report dict:

    - ``funnel``: [(stage, rows_in, rows_out), ...] from the curation
      funnel;
    - ``manifest``: [(epoch, shard_id, n_rows, order_digest), ...] —
      order_digest is bit_xor over md5('id@position') prefixes (the
      train_order_manifest discipline: order-free to compute, yet it
      pins the exact order; a consumer re-derives positions from
      (seed, plan) and verifies each shard with one number);
    - ``n_documents`` / ``n_instances``: survivors and (doc, epoch)
      training instances.

    The written layout streams without any loader-side sort:
    partition pruning picks (epoch, shard), file row order is
    position order."""
    from webloghunter_spark.pipelines.curate import curate_corpus
    from webloghunter_spark.pipelines.shard import epoch_order

    survivors, funnel = curate_corpus(
        docs,
        eval_df=eval_df,
        id_col=id_col,
        text_col=text_col,
        min_quality_bp=min_quality_bp,
        near_dedup_threshold=near_dedup_threshold,
        token_budget=token_budget,
    )
    ordered = epoch_order(
        survivors,
        group_col=group_col,
        alpha=alpha,
        max_epochs=max_epochs,
        n_shards=n_shards,
        seed=seed,
        id_col=id_col,
    )
    out = ordered.join(
        survivors.select(id_col, text_col), id_col
    )
    (
        # cluster by the partition columns THEN position: the
        # dynamic-partition writer re-sorts input not clustered by its
        # partition columns (non-stable — the write_training_order
        # lesson), but passes this prefix-sorted layout through, so
        # file row order is the training order
        out.repartition(n_shards, "epoch", "shard_id")
        .sortWithinPartitions("epoch", "shard_id", "position")
        .write.mode("overwrite")
        .partitionBy("epoch", "shard_id")
        .parquet(path)
    )
    dig = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("@"),
                    F.col("position").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    manifest = [
        (int(r["epoch"]), int(r["shard_id"]), int(r["n_rows"]),
         int(r["order_digest"]))
        for r in (
            ordered.withColumn("_dig", dig)
            .groupBy("epoch", "shard_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.bit_xor("_dig").alias("order_digest"),
            )
            .collect()
        )
    ]
    manifest.sort()
    n_docs = survivors.count()
    return {
        "funnel": funnel,
        "manifest": manifest,
        "n_documents": n_docs,
        "n_instances": sum(m[2] for m in manifest),
    }


def verify_training_dataset(
    spark,
    path: str,
    manifest: list[tuple],
    id_col: str = "doc_id",
) -> list[tuple]:
    """Consumer-side check of a build_training_dataset layout: re-read
    the ``epoch=E/shard_id=K`` partitions and recompute each shard's
    order digest from the PHYSICAL file row order — via the parquet
    ``_metadata.file_path`` / ``_metadata.row_index`` hidden columns,
    so the digest position is where the row actually sits in the file
    (files within a shard ordered by name), NOT the stored `position`
    column. A writer that shuffled rows but kept the column intact, a
    truncated file, or a dropped/extra shard all surface here.

    Returns one row per (epoch, shard_id) across the union of
    manifest and on-disk cells, sorted: (epoch, shard_id, n_rows,
    order_digest, manifest_n_rows, manifest_digest, ok) — n_rows /
    digest None for cells missing on disk, manifest fields None for
    unexpected cells.

    Scale: one scan of the dataset; the per-shard position is a
    window over (file_path, row_index) — already co-located by the
    partition layout — and the digest is the same order-free bit_xor
    the writer used, so verification is one exchange + one combinable
    aggregate regardless of shard count."""
    from pyspark.sql import Window as W

    df = spark.read.parquet(path).select(
        F.col(id_col),
        F.col("epoch").cast("long").alias("epoch"),
        F.col("shard_id").cast("long").alias("shard_id"),
        F.col("_metadata.file_path").alias("_fp"),
        F.col("_metadata.row_index").alias("_ri"),
    )
    w = W.partitionBy("epoch", "shard_id").orderBy("_fp", "_ri")
    dig = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("@"),
                    (F.row_number().over(w) - 1).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    actual = {
        (int(r["epoch"]), int(r["shard_id"])): (
            int(r["n_rows"]),
            int(r["order_digest"]),
        )
        for r in df.withColumn("_dig", dig)
        .groupBy("epoch", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("_dig").alias("order_digest"),
        )
        .collect()
    }
    expected = {(int(e), int(s)): (int(n), int(d)) for e, s, n, d in manifest}
    out = []
    for cell in sorted(set(actual) | set(expected)):
        a, m = actual.get(cell), expected.get(cell)
        out.append(
            (
                cell[0],
                cell[1],
                a[0] if a else None,
                a[1] if a else None,
                m[0] if m else None,
                m[1] if m else None,
                a is not None and a == m,
            )
        )
    return out
