"""Sequence packing for LLM pretraining: concatenate-and-chunk.

GPT-style pretraining packs documents by concatenating them in a fixed
order and slicing the token stream into fixed-size training chunks; a
document then occupies a contiguous chunk span. This module computes
that mapping declaratively: with `prefix` = tokens preceding the doc
in its shard's order,

    first_chunk = floor(prefix / budget)
    last_chunk  = floor((prefix + ntok - 1) / budget)   (empty docs: first)

Packing runs PER SHARD (`shard_col`, default `source`): each shard is
an independent token stream, so the prefix sum is a window partitioned
by shard — parallel across shards, no global single-partition stage
(the global variant is sessionize's two-level prefix-sum problem; use
a composite shard key to keep shards bounded).

Deterministic: a pure function of (shard, order-key, token counts) —
repartition-stable, and appends to the END of a shard's order never
remap existing docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webloghunter_spark.functions.text import token_count_expr


def pack_chunks(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    ntok_col: str | None = None,
) -> DataFrame:
    """Adds `ntok`, `first_chunk`, `last_chunk`, `n_chunks` per doc.

    `ntok_col` supplies precomputed token counts (e.g. a real
    tokenizer's); default derives whitespace counts from `text_col`."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ntok = F.col(ntok_col) if ntok_col else token_count_expr(text_col)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("ntok", ntok.cast("long"))
    prefix = F.sum("ntok").over(w) - F.col("ntok")
    first = F.floor(prefix / budget)
    last = F.when(
        F.col("ntok") > 0, F.floor((prefix + F.col("ntok") - 1) / budget)
    ).otherwise(first)
    return (
        out.withColumn("first_chunk", first.cast("long"))
        .withColumn("last_chunk", last.cast("long"))
        .withColumn("n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1))
    )


def sliding_chunks(
    df: DataFrame,
    window: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sliding-window chunking with overlap — the RAG /
    long-context training slicer `pack_chunks` (stream concat-and-cut)
    is not: chunk k covers tokens [k*stride, k*stride + window), and a
    new chunk is emitted only while the previous window did not already
    reach the document's end, so n_chunks = 1 + ceil((ntok-window)/
    stride) for non-empty docs and tails are never re-emitted as
    fully-contained slivers. Empty documents produce no chunks.

    Chunk text is emitted as md5 of the space-joined token slice plus
    its length — hash-stable across engines, and downstream chunk-level
    dedup wants exactly that digest anyway.

    Whole-stage codegen throughout (split/slice/concat_ws/md5, integer
    ceil via (ntok - window + stride - 1) div stride — no float); the
    explode is narrow, so the op is a single scan with no shuffle and
    scales with output chunk count alone.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window/stride must be > 0, got {window}/{stride}")
    from webloghunter_spark.functions.text import tokens_expr

    toks = tokens_expr(text_col)
    ntok = F.size(toks).cast("long")
    extra = F.floor(
        (ntok - F.lit(window) + F.lit(stride) - 1) / F.lit(stride)
    ).cast("long")
    n_chunks = F.when(ntok <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.greatest(extra, F.lit(0))
    )
    base = df.select(
        id_col,
        toks.alias("_toks"),
        ntok.alias("ntok"),
        n_chunks.alias("n_chunks"),
    )
    start = (F.col("chunk_id") * stride).cast("int")
    sl = F.slice(F.col("_toks"), start + 1, window)
    return (
        base.withColumn(
            "chunk_id",
            F.explode(
                F.when(
                    F.col("n_chunks") > 0,
                    F.sequence(
                        F.lit(0), (F.col("n_chunks") - 1).cast("int")
                    ),
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .select(
            id_col,
            "chunk_id",
            start.cast("long").alias("start_tok"),
            F.size(sl).cast("long").alias("chunk_len"),
            F.md5(F.concat_ws(" ", sl)).alias("chunk_md5"),
        )
    )


PACK_ROWS_PER_SHARD = 5_000  # auto-shard target: rows per NFD walk


def auto_pack_shards(n_rows: int) -> int:
    """Shard count for `n_rows` documents: one shard per
    PACK_ROWS_PER_SHARD rows (each shard is a sequential O(rows/shard)
    walk — the round-5 32x probe measured fixed shards going 4.5x),
    floored at 4. Pure integer arithmetic so the SQL oracle re-derives
    the same count from count(*)."""
    return max(4, -(-max(int(n_rows), 0) // PACK_ROWS_PER_SHARD))


def pack_bins(
    df: DataFrame,
    budget: int = 512,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Greedy next-fit-decreasing bin packing of WHOLE documents into
    token-budget bins — the "sample packing" step that builds training
    batches without splitting documents (pack_chunks slices a stream;
    this preserves document boundaries so attention never crosses
    docs). Returns (id, shard_id, bin_id, ntok).

    Packing is inherently sequential, so it runs as a per-shard kernel
    (the tool-scanner discipline): documents are md5-bucketed into
    `n_shards` independent shards, each shard sorts by (ntok DESC, id)
    and walks once — open a new bin whenever the current one would
    overflow; oversize docs (> budget) get bins of their own. The
    kernel is O(rows-per-shard) numpy/python inside applyInPandas;
    shard count is the scale knob, and `n_shards=None` (the default)
    DERIVES it from the row count via `auto_pack_shards` — one cheap
    count() — so the walk stays bounded as the corpus grows instead
    of the fixed-shard 4.5x the 32x probe measured; only two small
    columns ((id, ntok), never text) reach the kernel. Deterministic:
    shard membership is md5 and the auto rule is integer arithmetic
    on count(*), the walk order is a total order, so the oracle
    replays both with a recursive CTE.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    from webloghunter_spark.pipelines.shard import shard_expr

    if n_shards is None:
        n_shards = auto_pack_shards(df.count())
    base = df.select(
        F.col(id_col),
        shard_expr(id_col, n_shards, salt).alias("shard_id"),
        token_count_expr(text_col).alias("ntok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["ntok", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        first = True
        for nt in pdf["ntok"]:
            nt = int(nt)
            if first:
                cur, fill, first = 0, nt, False
            elif fill + nt > budget:
                cur += 1
                fill = nt
            else:
                fill += nt
            bins.append(cur)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[[id_col, "shard_id", "ntok", "bin_id"]]

    return base.groupBy("shard_id").applyInPandas(
        pack, f"{id_col} long, shard_id int, ntok long, bin_id long"
    )


def padding_waste(
    df: DataFrame,
    max_seq_len: int = 128,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Padding-efficiency report for the NAIVE (no-packing) loading
    strategy: each document is chunked into ceil(ntok/L) sequences of
    length L and the last chunk is padded. Per group:
    (n_docs, n_tokens, n_seqs, pad_tokens, waste_bp) with waste_bp =
    pad / (n_seqs * L) in basis points — the fraction of the training
    batch that is padding. This is the number that justifies running
    pack_bins/pack_chunks at all: compare waste_bp here against the
    packed layout's residual waste to price the packing step.

    Scale: pure per-row arithmetic on the token count feeding ONE
    map-side-combinable aggregate — no shuffle beyond |groups| cells,
    no text movement. Zero-token docs contribute zero sequences (they
    would be dropped by the loader, not padded)."""
    if max_seq_len <= 0:
        raise ValueError(f"max_seq_len must be positive, got {max_seq_len}")
    # integer ceil-div via `div` (long division end to end — the
    # DuckDB oracle's `//` is replayed exactly, with no double
    # quotient anywhere in the path)
    per = (
        df.select(
            F.col(group_col),
            token_count_expr(text_col).alias("_ntok"),
        )
        .withColumn(
            "_seqs",
            F.expr(
                f"(_ntok + {int(max_seq_len) - 1}) div {int(max_seq_len)}"
            ),
        )
        .withColumn(
            "_pad", F.col("_seqs") * max_seq_len - F.col("_ntok")
        )
    )
    # waste_bp on the exact integer cross-multiply grid
    # (x*20000 + den) div (2*den) — round-half-up with NO double
    # quotient, so the bp value cannot flip at a boundary across
    # engines (the interleave_audit / lang_consistency convention)
    L = int(max_seq_len)
    return (
        per.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.sum("_seqs").alias("n_seqs"),
            F.sum("_pad").alias("pad_tokens"),
        )
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            "n_seqs",
            "pad_tokens",
            F.when(
                F.col("n_seqs") > 0,
                F.expr(
                    f"(pad_tokens * 20000 + n_seqs * {L}) "
                    f"div (2 * n_seqs * {L})"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("waste_bp"),
        )
    )


def fim_splits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle split points (Bavarian et al. 2022: FIM
    training cuts each document into prefix/middle/suffix and
    reorders to PSM/SPM): two md5-derived character positions per
    document — pure functions of (seed, id), so the split is
    reproducible across engines/runs and a different seed re-cuts
    the corpus. Returns (id, n_chars, n_prefix, n_middle, n_suffix,
    fim_digest): the three span lengths plus md5 over the
    0x1f-separated prefix|middle|suffix reconstruction — one string
    that pins the exact byte split (any off-by-one shifts a
    character across a separator and changes the digest).

    Scale: one narrow projection — two md5s, two substrs, one md5
    digest per row; no shuffle, no state. Empty docs emit zero spans
    and the empty-split digest."""
    c = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col,
        F.lit(""),
    )
    n = F.length(c)

    def cut(tag: str):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed),
                        F.lit(f"|{tag}|"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        # ANSI: % 0 throws — guard the empty doc inside the branch
        return F.when(n > 0, h % n).otherwise(F.lit(0))

    lo = F.least(cut("1"), cut("2"))
    hi = F.greatest(cut("1"), cut("2"))
    prefix = F.substring(c, 1, lo)
    middle = F.substring(c, (lo + 1).cast("int"), (hi - lo).cast("int"))
    suffix = F.substring(c, (hi + 1).cast("int"), (n - hi).cast("int"))
    sep = F.lit("\x1f")
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        lo.cast("long").alias("n_prefix"),
        (hi - lo).cast("long").alias("n_middle"),
        (n - hi).cast("long").alias("n_suffix"),
        F.md5(F.concat(prefix, sep, middle, sep, suffix)).alias("fim_digest"),
    )


def span_corruption_plan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "t5",
    rate_bp: int = 1500,
) -> DataFrame:
    """T5-style span-corruption plan (Raffel et al. 2020: mask ~15%
    of tokens as contiguous spans and train to reconstruct): each
    token position flips corrupted when md5(seed|id|pos) lands below
    `rate_bp` on the 10000-grid — a pure function of (seed, id, pos),
    so any engine re-derives the identical mask and a new seed
    re-masks. Adjacent corrupted positions form one span (T5 replaces
    a RUN with a single sentinel). Returns (id, ntok, n_corrupted,
    n_spans, corrupt_bp, masked_digest) — masked_digest is md5 of the
    text with corrupted tokens replaced by '<X>', pinning the exact
    mask, not just its size.

    Scale: the per-position md5 is the real cost (one per token), so
    it runs CODEGEN'd on posexplode'd rows — measured 2.1x faster at
    the 32x probe (15.7 s vs 33.3 s) than evaluating the same md5
    inside an interpreted transform() HOF. The rebuild is one
    groupBy(id) with array_sort(collect_list) (the
    remove_repeated_spans pattern — per-doc memory O(ntok), the same
    bound as holding the document); span counting and the masked
    join are cheap boolean/string HOFs over the assembled array.
    Work is linear in token volume.
    """
    if not 0 <= rate_bp <= 10000:
        raise ValueError(f"rate_bp must be in [0, 10000], got {rate_bp}")
    from webloghunter_spark.functions.text import tokens_expr

    from webloghunter_spark.functions.text import hash_bucket_expr

    t = tokens_expr(text_col)
    pos = df.select(
        F.col(id_col), F.posexplode(t).alias("_p", "_tok")
    )
    # the coin is the shared md5 feature-hash (hash_bucket_expr — the
    # single parity surface every oracle mirrors), keyed on
    # seed|id|1-based-pos
    flag = (
        hash_bucket_expr(
            F.concat(
                F.lit(seed),
                F.lit("|"),
                F.col(id_col).cast("string"),
                F.lit("|"),
                (F.col("_p") + 1).cast("string"),
            ),
            10000,
        )
        < rate_bp
    )
    agg = (
        pos.select(id_col, "_p", "_tok", flag.alias("_f"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_ntok"),
            F.sum(F.when(F.col("_f"), 1).otherwise(0)).alias("_nc"),
            F.array_sort(
                F.collect_list(F.struct("_p", "_f", "_tok"))
            ).alias("_arr"),
        )
    )
    flags = F.transform("_arr", lambda x: x["_f"])
    # single-pass run counter: a span starts where corrupted follows
    # clean; fold state = (count, previous flag)
    n_spans = F.aggregate(
        flags,
        F.struct(
            F.lit(0).cast("long").alias("c"), F.lit(False).alias("prev")
        ),
        lambda acc, f: F.struct(
            (acc["c"] + F.when(f & ~acc["prev"], 1).otherwise(0)).alias(
                "c"
            ),
            f.alias("prev"),
        ),
        lambda acc: acc["c"],
    )
    masked = F.array_join(
        F.transform(
            "_arr",
            lambda x: F.when(x["_f"], "<X>").otherwise(x["_tok"]),
        ),
        " ",
    )
    scored = agg.select(
        F.col(id_col),
        F.col("_ntok").cast("long").alias("ntok"),
        F.col("_nc").cast("long").alias("n_corrupted"),
        n_spans.cast("long").alias("n_spans"),
        F.floor(
            F.col("_nc").cast("double") * 10000.0
            / F.col("_ntok").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("corrupt_bp"),
        F.md5(masked).alias("masked_digest"),
    )
    # empty/NULL-text docs produce no exploded rows: zero-fill with
    # the empty-mask digest (md5('') — what the rebuild would emit)
    return df.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("ntok", F.lit(0)).alias("ntok"),
        F.coalesce("n_corrupted", F.lit(0)).alias("n_corrupted"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("corrupt_bp", F.lit(0)).alias("corrupt_bp"),
        F.coalesce("masked_digest", F.md5(F.lit(""))).alias(
            "masked_digest"
        ),
    )


def padding_curve(
    df: DataFrame,
    seq_lens: tuple = (128, 512, 1024, 2048),
    text_col: str = "text",
) -> DataFrame:
    """Padding waste vs context length — the sizing analysis read
    before pinning a training sequence length (padding_waste's
    sensitivity-curve sibling, corpus-level): for each candidate L,
    how many naive ceil(ntok/L) sequences the corpus loads as and
    what fraction of their slots is pad. ONE combinable aggregate
    computes every length's sums in a single scan (per-L conditional
    sums over the same ntok projection — the dedup_sensitivity
    shared-pass shape); the per-L rows explode from the 1-row result.
    All integer arithmetic (div / half-up bp), no text movement, no
    shuffle beyond the aggregate."""
    from webloghunter_spark.functions.text import token_count_expr

    lens = [int(x) for x in seq_lens]
    if not lens or any(x < 1 for x in lens):
        raise ValueError(f"seq_lens must be non-empty, all >= 1: {seq_lens}")
    base = df.select(token_count_expr(text_col).alias("_n"))
    row = base.agg(
        F.count(F.lit(1)).alias("_docs"),
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("_tok"),
        *[
            F.coalesce(F.sum(F.expr(f"(_n + {x - 1}) div {x}")), F.lit(0))
            .cast("long")
            .alias(f"_s{x}")
            for x in lens
        ],
    )
    structs = []
    for x in lens:
        slots = F.col(f"_s{x}") * x
        pad = slots - F.col("_tok")
        waste = F.when(
            slots > 0,
            F.expr(f"((_s{x} * {x} - _tok) * 20000 + _s{x} * {x}) "
                   f"div (2 * _s{x} * {x})"),
        ).otherwise(F.lit(0))
        structs.append(
            F.struct(
                F.lit(x).cast("long").alias("seq_len"),
                F.col(f"_s{x}").alias("n_seqs"),
                pad.cast("long").alias("pad_tokens"),
                waste.cast("long").alias("waste_bp"),
            )
        )
    return (
        row.select(
            "_docs", "_tok", F.explode(F.array(*structs)).alias("_r")
        )
        .select(
            F.col("_r.seq_len").alias("seq_len"),
            F.col("_docs").alias("n_docs"),
            F.col("_tok").alias("n_tokens"),
            F.col("_r.n_seqs").alias("n_seqs"),
            F.col("_r.pad_tokens").alias("pad_tokens"),
            F.col("_r.waste_bp").alias("waste_bp"),
        )
    )
