"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes, fan-out — is real and tested. The actual media decoding is
STUBBED: the container has no image/audio libraries, so `_decode_stub`
derives deterministic fake dimensions/features from the payload bytes.
Swap `_decode_stub` for a PIL/libav call in a real deployment; the
decode call sites are marked with `NotImplementedError` guards behind
`use_real_codecs=True`.

Design for 100 TB of media:
- payloads stay in `binary` columns (parquet keeps them out of
  dictionary/stats paths); metadata lives in a sibling struct so
  filters prune on metadata without touching bytes;
- all decode/feature ops are mapInPandas over Arrow batches — one
  Python roundtrip per batch, not per row, and each partition streams;
- fan-out ops (frame sampling) emit multiple rows per input inside the
  batch iterator, so no explode of materialized arrays.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "mime string, n_bytes long, sha1 string"
DECODED_SCHEMA = "width int, height int, channels int"


def with_media_metadata(
    df: DataFrame, payload_col: str = "payload", mime: str = "application/octet-stream"
) -> DataFrame:
    """Attach a typed metadata struct computed natively (no Python)."""
    p = F.col(payload_col)
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.length(p).cast("long").alias("n_bytes"),
        F.sha1(p).alias("sha1"),
    )
    return df.withColumn("media_meta", meta)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from content hash.

    REAL IMPLEMENTATION GOES HERE (PIL.Image.open(BytesIO(payload))).
    """
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 3


def decode_media(
    df: DataFrame, payload_col: str = "payload", use_real_codecs: bool = False
) -> DataFrame:
    """Add (width, height, channels) per media row via mapInPandas."""
    if use_real_codecs:
        raise NotImplementedError(
            "real image/audio codecs are not available in this environment; "
            "wire PIL/torchaudio into _decode_stub and pass use_real_codecs"
        )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {DECODED_SCHEMA}"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf[payload_col].map(lambda b: _decode_stub(bytes(b)))
            pdf = pdf.copy()
            pdf["width"] = dims.map(lambda d: d[0]).astype("int32")
            pdf["height"] = dims.map(lambda d: d[1]).astype("int32")
            pdf["channels"] = dims.map(lambda d: d[2]).astype("int32")
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def media_embedding_udf(dim: int = 16):
    """Deterministic fake feature vector from payload bytes
    (REAL model inference goes here), as array<float>."""

    def embed(b) -> list[float]:
        h = hashlib.sha256(bytes(b)).digest()
        return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]

    @F.pandas_udf("array<float>")
    def _udf(payloads: pd.Series) -> pd.Series:
        return payloads.map(embed)

    return _udf


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    use_real_codecs: bool = False,
) -> DataFrame:
    """Resize each media payload to (target_w, target_h) via mapInPandas.

    The decode/scale/encode is STUBBED (deterministic: truncate/tile the
    payload bytes to w*h); REAL implementation is
    PIL.Image.open(...).resize((w, h)).save(...). The Spark plumbing —
    binary-in/binary-out schema, metadata update, Arrow batching — is
    the real 100 TB shape: one Python round-trip per batch, payloads
    never leave the executor as rows."""
    if use_real_codecs:
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "wire PIL into the batch fn and pass use_real_codecs"
        )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    ) + f", `{payload_col}` binary, width int, height int"
    n_out = max(target_w * target_h, 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()

            def scale(b) -> bytes:
                raw = bytes(b)
                if not raw:
                    raw = b"\x00"
                reps = (n_out + len(raw) - 1) // len(raw)
                return (raw * reps)[:n_out]

            pdf[payload_col] = pdf[payload_col].map(scale)
            pdf["width"] = target_w
            pdf["height"] = target_h
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    num_frames: int = 4,
) -> DataFrame:
    """Fan out each 'video' payload into `num_frames` frame rows —
    (media_id, frame_idx, frame_payload) — inside the Arrow batch
    iterator (no materialized arrays, streams at batch granularity)."""
    out_schema = f"`{id_col}` long, frame_idx int, frame_payload binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n = max(len(b) // num_frames, 1)
                for i in range(num_frames):
                    # REAL frame extraction goes here (av.open keyframes).
                    rows.append((int(mid), i, b[i * n : (i + 1) * n]))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "frame_payload"]
            )

    return df.mapInPandas(batches, schema=out_schema)
